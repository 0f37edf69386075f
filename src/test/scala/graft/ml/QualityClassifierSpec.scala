package graft.ml

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val junkVocab = Vector("zzq", "xxv", "qqw", "vvb", "kkp",
    "jjt", "wwm", "yyr", "hhn", "ggd")

  private def junkDocs(n: Int, idBase: Long) = (0 until n).map { i =>
    val rnd = new scala.util.Random(1000 + i)
    (idBase + i,
      (0 until 60).map(_ => junkVocab(rnd.nextInt(junkVocab.size)))
        .mkString(" "))
  }.toDF("doc_id", "text")

  test("classifier separates corpus text from junk; deterministic; map-side score") {
    val clean = Tables.documents(spark, sf).select($"doc_id", $"text")
      .withColumn("label", lit(1.0))
    val junk = junkDocs(100, 100000L).withColumn("label", lit(0.0))
    val all = clean.unionByName(junk)
    // held-out split by id parity — test docs share the DISTRIBUTIONS
    // (corpus vocab vs junk vocab), never the exact rows
    val train = all.filter($"doc_id" % 2 === 0)
    val test = all.filter($"doc_id" % 2 =!= 0)
    val model = QualityClassifier.train(train, "label", "text")
    val scored = QualityClassifier.score(model, test)
    assert(scored.columns.toSeq == Seq("doc_id", "text", "label", "quality_p"),
      "score must add exactly one column and drop its intermediates")
    val means = scored.groupBy("label").agg(avg("quality_p").as("m"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(means(1.0) > 0.8, s"held-out clean mean ${means(1.0)} too low")
    assert(means(0.0) < 0.2, s"held-out junk mean ${means(0.0)} too high")
    // the filter stage drops junk wholesale at the midpoint threshold
    val keptJunk = QualityClassifier
      .filterByQuality(model, junkDocs(50, 200000L), 0.5).count()
    assert(keptJunk == 0, s"$keptJunk junk docs survived the 0.5 cut")
    // deterministic: a re-trained model scores identically (seedless
    // stages only — tokenizer/hashing are pure functions, L-BFGS from
    // a fixed init on identical data converges to identical weights)
    val again = QualityClassifier.score(
      QualityClassifier.train(train, "label", "text"), test)
    assert(scored.collect().toSet == again.collect().toSet,
      "retraining on identical data must reproduce identical scores")
    // scoring is map-side: no exchange in the scoring plan
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"scoring must be one map-side pass, got:\n$plan")
  }
}
