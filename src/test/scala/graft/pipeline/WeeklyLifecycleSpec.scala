package graft.pipeline

import graft.SparkSpec
import graft.sources.Sources
import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end weekly lifecycle (SURVEY §3.1): four weeks of loan data
  * arrive, the ordered runner processes each exactly once, each week's
  * silver/gold stores land as week partitions, and the per-week label
  * stores union back to the full corpus.
  */
class WeeklyLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("ordered weekly runs build per-week stores exactly once") {
    val root = Files.createTempDirectory("lifecycle").toString
    val raw = FixtureGen.table(spark, Schemas.loanTermsRaw, 300).cache()
    val weeks = raw.select(date_format($"snapshot_date", "yyyy-MM-dd"))
      .distinct().as[String].collect().sorted.toSeq
    assert(weeks.size == 4)

    val ledger = scala.collection.mutable.Set[String]()
    val done = EventStream.runWeeklyOrdered(weeks, ledger) { w =>
      val weekDf = Bronze.weekFilter(raw, w)
      val silver = Silver.loanTerms(weekDf)
      Sources.writeParquet(Gold.labelStore(silver),
        s"$root/label_store_week_${w.replace('-', '_')}")
    }
    assert(done == weeks)

    // re-run: ledger makes it a no-op (exactly-once)
    assert(EventStream.runWeeklyOrdered(weeks, ledger)(_ => fail()).isEmpty)

    // the catalog sees all four partitions; their union equals the
    // all-at-once label store
    val parts = Sources.listPartitions(spark, root, "label_store_week_")
    assert(parts.size == 4)
    val unioned = Sources.parquet(spark, parts.map(p => s"$root/$p"): _*)
    val direct = Gold.labelStore(Silver.loanTerms(raw))
    assert(unioned.count() == direct.count())
    assert(unioned.except(direct).count() == 0)
  }

  test("retrain trigger + registry drive degrade -> retrain -> recover") {
    import graft.ml.Lifecycle
    import java.time.LocalDate
    val dir = Files.createTempDirectory("weeklylc").toString
    val tracker = new Lifecycle.RetrainTracker(s"$dir/last_retraining_date.json")
    val registry = new Lifecycle.JsonRegistry(s"$dir/registry.json")
    val model = "credit_scoring_model"

    // initial training (the reference's run_initial_training_flow)
    val w1 = LocalDate.parse("2024-01-07")
    Lifecycle.registerAndPromote(registry, tracker, model, s"$dir/runs/w1", w1, 0.91)
    assert(registry.production(model).get.runPath.endsWith("/runs/w1"))

    // weekly lifecycle: (week, observed macro-F1 of the production model)
    val observed = Seq(
      LocalDate.parse("2024-01-14") -> 0.90,  // healthy
      LocalDate.parse("2024-01-21") -> 0.85,  // degraded -> retrain
      LocalDate.parse("2024-01-28") -> 0.92)  // recovered
    var retrains = List.empty[LocalDate]
    observed.foreach { case (week, f1) =>
      val dec = Lifecycle.shouldRetrain(Some(f1),
        tracker.read().map(_.lastRetrainingDate), week)
      if (dec.retrain) {
        retrains ::= week
        Lifecycle.registerAndPromote(registry, tracker, model,
          s"$dir/runs/w_$week", week, f1)
      }
    }
    // the 0.87 rule fired exactly once, on the degraded week
    assert(retrains == List(LocalDate.parse("2024-01-21")))
    // the retrained model is what the NEXT week's inference resolves
    val prod = registry.production(model).get
    assert(prod.version == 2 && prod.runPath.endsWith("w_2024-01-21"))
    assert(tracker.read().get.lastRetrainingDate == LocalDate.parse("2024-01-21"))

    // ... and 90 days of healthy metrics later, the time rule fires
    val dec90 = Lifecycle.shouldRetrain(Some(0.95),
      tracker.read().map(_.lastRetrainingDate),
      LocalDate.parse("2024-01-21").plusDays(90))
    assert(dec90.retrain && dec90.reason.contains("90"))
  }

  test("SQL interface answers the same query as the DataFrame API") {
    graft.core.Tables.lineitem(spark, sf).createOrReplaceTempView("li")
    val sqlOut = spark.sql(
      """SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty
        |FROM li GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    val dfOut = graft.core.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 4).as("sum_qty"))
      .orderBy("l_returnflag")
    assert(sqlOut.collect().toSeq == dfOut.collect().toSeq)
  }
}
