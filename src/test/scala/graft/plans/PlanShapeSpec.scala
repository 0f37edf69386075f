package graft.plans

import graft.SparkSpec
import graft.queries.Relational
import org.apache.spark.sql.functions._

/** Plan-shape proofs for the scale claims the docs make: column pruning
  * and filter pushdown reach the parquet scan, and Spark's runtime
  * bloom-filter injection guards selective fact⋈fact joins.
  */
class PlanShapeSpec extends SparkSpec {

  test("projection prunes the scan to the referenced columns (P2)") {
    val plan = Relational.p2Select(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<c_custkey:bigint,c_mktsegment:string>"),
      s"expected a 2-column ReadSchema:\n$plan")
  }

  test("date-range predicate is pushed to the parquet scan (P5)") {
    val plan = Relational.p5Between(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"expected l_shipdate in PushedFilters:\n$plan")
  }

  test("llmSelectPipeline tokenizes the corpus exactly once (tokenize-once contract)") {
    // the composite splits the text into the shared (id, toks)
    // projection ONCE (an eager localCheckpoint); both the Gopher stage
    // and DSIR's gram pipeline consume the materialized token arrays,
    // so the downstream optimized plan must carry ZERO split() calls —
    // re-tokenizing per stage is the dominant map cost at 100 TB
    val out = graft.queries.Documents.llmSelectPipeline(spark, sf)
    val optimized = out.queryExecution.optimizedPlan.toString
    val splits = "split\\(".r.findAllIn(optimized).length
    assert(splits == 0,
      s"expected no split() downstream of the shared projection, found $splits:\n$optimized")
    assert(out.count() > 0, "the composite still selects documents")
  }

  test("llmDoremiPipeline tokenizes the corpus exactly once (tokenize-once contract)") {
    // the checkpointed (domain, id, toks) projection feeds the DoReMi
    // weights, the mix's skinny draw rank, and the token census — no
    // stage may re-split the text
    val out = graft.queries.Documents.llmDoremiPipeline(spark, sf)
    val optimized = out.queryExecution.optimizedPlan.toString
    val splits = "split\\(".r.findAllIn(optimized).length
    assert(splits == 0,
      s"expected no split() downstream of the shared projection, found $splits:\n$optimized")
    assert(out.count() > 0, "the composite still selects documents")
  }

  test("runtime bloom filter guards a selective fact-to-fact join") {
    // a selective filter on one join side → Spark injects a bloom filter
    // on the other side's key so most rows die before the shuffle. The
    // feature is ON by default (Spark ≥3.4); what gates it on smoke data
    // are the size thresholds sized for real tables — lower them for the
    // scope of this test so the injection demonstrably fires
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = graft.core.Tables.orders(spark, sf)
        .filter(col("o_totalprice") > 500000) // highly selective
      val li = graft.core.Tables.lineitem(spark, sf)
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") ||
        optimized.contains("BloomFilter"),
        s"expected an injected bloom filter in:\n$optimized")
    } finally {
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
