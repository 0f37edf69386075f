package graft.functions

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class ModeAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed mode aggregator matches the groupBy-count idiom") {
    val li = Tables.lineitem(spark, sf)
    val viaAgg = li.agg(ModeAggregator.modeOf($"l_returnflag")).as[String].first()
    val viaGroupBy = li.groupBy("l_returnflag").count()
      .orderBy(desc("count"), asc("l_returnflag"))
      .select("l_returnflag").as[String].first()
    assert(viaAgg == viaGroupBy)
  }

  test("per-group mode in one pass; ties break to smallest value; nulls skipped") {
    val df = Seq(
      ("g1", "b"), ("g1", "b"), ("g1", "a"), ("g1", "a"), // tie -> a
      ("g2", "z"), ("g2", null), ("g2", null)             // nulls don't count
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(ModeAggregator.modeOf($"v").as("m"))
      .orderBy("g").as[(String, String)].collect()
    assert(out.toSeq == Seq(("g1", "a"), ("g2", "z")))
  }

  test("empty input yields null, not an exception") {
    val out = Seq.empty[String].toDF("v")
      .agg(ModeAggregator.modeOf($"v")).collect()
    assert(out(0).isNullAt(0))
  }
}
