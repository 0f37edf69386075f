package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exactDedup keeps one row per normalized text, smallest id") {
    val df = Seq(
      (3L, "Hello  World"), (1L, "hello world"), (2L, "other text"),
      (5L, "HELLO WORLD ")).toDF("doc_id", "text")
    val out = Dedup.exactDedup(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L))
  }

  test("shingles: fewer tokens than n yields no shingles") {
    val df = Seq((1L, "one two"), (2L, "a b c d")).toDF("doc_id", "text")
    val sh = Dedup.shingles(df, "doc_id", "text", 3)
    assert(sh.filter($"id" === 1L).count() == 0)
    assert(sh.filter($"id" === 2L).as[(Long, String)].collect().map(_._2).sorted.toSeq
      == Seq("a b c", "b c d"))
  }

  test("minHashLshDedup matches exact jaccardPairs ground truth") {
    val docs = Tables.documents(spark, sf)
    val exact = Dedup.jaccardPairs(
      Dedup.shingles(docs, "doc_id", "text", 3), 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minHashLshDedup(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh == exact)
  }

  test("simHashPairs finds most planted near-dups, verified hamming") {
    val docs = Tables.documents(spark, sf)
    val exact = Dedup.jaccardPairs(
      Dedup.shingles(docs, "doc_id", "text", 3), 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sim = Dedup.simHashPairs(Dedup.simHash(docs, "doc_id", "text"), 6)
    val simPairs = sim.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sim.filter($"hamming" > 6).count() == 0)
    val recall = (simPairs & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"simhash recall $recall too low")
  }
}
