package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount and subword estimate") {
    val df = Seq("one two three", "internationalization").toDF("text")
    val out = df.select(
      TextAnalysis.tokenCount($"text").as("t"),
      TextAnalysis.subwordCountEstimate($"text").as("s"))
      .as[(Int, Long)].collect()
    assert(out(0) == ((3, 4)))       // 3+3+5 chars -> 1+1+2 subwords
    assert(out(1) == ((1, 5)))       // 20 chars -> ceil(20/4) = 5
  }

  test("fingerprint is whitespace- and case-invariant") {
    val df = Seq("Hello   World", "hello world", "hello  world ").toDF("text")
    val fps = df.select(TextAnalysis.fingerprint($"text")).as[String].collect()
    assert(fps.distinct.length == 1)
  }

  test("langId picks the profile language; ties break alphabetically") {
    val df = Seq(
      "the cat is on the mat and it is happy",
      "el gato es un animal y que los perros",
      "der hund ist nicht ein tier mit der katze",
      "xyzzy qwerty asdf").toDF("text")
    val out = df.select(TextAnalysis.langId($"text")).as[String].collect()
    assert(out.toSeq == Seq("en", "es", "de", "de")) // all-zero ties -> first profile
  }

  test("quality features are bounded and deterministic") {
    val df = Seq("the quick brown fox!! of and a ???", "x").toDF("text")
    val rows = df.select(Seq(lit(1).as("k")) ++
      TextAnalysis.qualityFeatures($"text", Seq("the", "of", "and", "a")): _*).collect()
    val r = rows(0)
    assert(r.getAs[Double]("punct_ratio") > 0 && r.getAs[Double]("punct_ratio") < 1)
    assert(r.getAs[Double]("stopword_ratio") === 0.5)
  }
}
