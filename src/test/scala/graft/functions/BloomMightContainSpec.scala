package graft.functions

import graft.SparkSpec
import graft.core.Tables
import graft.operators.Dedup
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

class BloomMightContainSpec extends SparkSpec {
  import spark.implicits._

  private def filterFor(keys: Seq[Long], fpp: Double = 0.001): Array[Byte] = {
    val bf = BloomFilter.create(math.max(keys.size.toLong, 1L), fpp)
    keys.foreach(bf.putLong)
    BloomMightContain.toBytes(bf)
  }

  test("no false negatives; nulls stay null; non-members mostly rejected") {
    val members = (1L to 1000L).map(_ * 7919L)
    val bytes = filterFor(members)
    val probeD = (members.map(k => (Some(k), true)) ++
      (1L to 1000L).map(k => (Some(k * 7919L + 1L), false)) :+
      ((None: Option[Long]), false))
      .toDF("key", "is_member")
    val out = probeD.withColumn("hit",
      GraftFunctions.bloomMightContain(spark, col("key"), bytes))
    // a Bloom filter NEVER misses a member
    assert(out.filter($"is_member" && !$"hit").count() == 0)
    // null key → null verdict, not false (nullSafeEval contract)
    assert(out.filter($"key".isNull).select($"hit").first().isNullAt(0))
    // at fpp 1e-3 the 1000 non-members should see ~1 false positive;
    // 20 is ~6 σ of margin — a probe that answers true unconditionally
    // (or hashes the wrong bytes) fails this hard
    val fps = out.filter(!$"is_member" && $"key".isNotNull && $"hit").count()
    assert(fps <= 20, s"false-positive count $fps is far beyond fpp=1e-3")
  }

  test("probe is plan-constant: filter deserialized once, codegen'd") {
    // sized for 1000 keys but holding one: a 1-key-sized filter is ~15
    // bits and its REAL fp rate against 100k probes is granular (~0.3%),
    // which is the sketch's geometry, not a probe bug — size honestly
    val bf = BloomFilter.create(1000L, 0.001)
    bf.putLong(42L)
    val bytes = BloomMightContain.toBytes(bf)
    val out = spark.range(0, 100000, 1, 4)
      .withColumn("hit", GraftFunctions.bloomMightContain(spark, col("id"), bytes))
      .filter(col("hit")).select("id").as[Long].collect()
    // 42 must survive; the plan must not blow up deserializing per row
    // (a per-row readFrom would time this spec out long before failing)
    assert(out.contains(42L))
    assert(out.length <= 200, "fpp dribble only — the filter must actually filter")
  }

  test("bloomContaminationPairs equals contaminationPairs bit for bit") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter($"doc_id" % 97 =!= 0)
    val eval = docs.filter($"doc_id" % 97 === 0)
    val exact = Dedup.contaminationPairs(corpus, eval, "doc_id", "text", 3)
      .as[(Long, Long, Long)].collect().toSet
    val bloom = Dedup.bloomContaminationPairs(corpus, eval, "doc_id", "text", 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture must actually contaminate")
    assert(bloom == exact,
      "verify join must cancel every Bloom false positive and lose nothing")
  }

  test("decontaminate routes by eval gram count; both routes agree") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter($"doc_id" % 97 =!= 0)
    val eval = docs.filter($"doc_id" % 97 === 0)
    // default threshold: this eval is far below 50M grams → exact route
    val viaExact = Dedup.decontaminate(corpus, eval, "doc_id", "text")
    assert(!viaExact.queryExecution.analyzed.toString
      .contains("bloom_might_contain"), "small eval must take the broadcast route")
    // forced tiny threshold → bloom route, same answer
    val viaBloom = Dedup.decontaminate(corpus, eval, "doc_id", "text",
      maxBroadcastGrams = 0L)
    assert(viaBloom.queryExecution.analyzed.toString
      .contains("bloom_might_contain"), "over-threshold eval must take the Bloom route")
    assert(viaExact.as[(Long, Long, Long)].collect().toSet ==
      viaBloom.as[(Long, Long, Long)].collect().toSet)
  }

  test("hot-shingle cap applies identically on the Bloom path") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter($"doc_id" % 97 =!= 0)
    val eval = docs.filter($"doc_id" % 97 === 0)
    val exact = Dedup.contaminationPairs(corpus, eval, "doc_id", "text", 3,
      maxDocFreq = Some(3)).as[(Long, Long, Long)].collect().toSet
    val bloom = Dedup.bloomContaminationPairs(corpus, eval, "doc_id", "text", 3,
      maxDocFreq = Some(3)).as[(Long, Long, Long)].collect().toSet
    assert(bloom == exact)
  }
}
