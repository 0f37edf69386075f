package graft.ops

import graft.SparkSpec
import graft.core.Tables
import graft.sources.Bucketed
import org.apache.spark.sql.functions._

class SkewBucketSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin is row-identical to the plain join under heavy skew") {
    // 90% of rows share one hot key
    val big = spark.range(10000)
      .select(when($"id" % 10 < 9, 1L).otherwise($"id").as("k"), $"id".as("v"))
    val small = Seq((1L, "hot"), (42L, "cold"), (7777L, "x")).toDF("k", "name")
    val plain = big.join(small, Seq("k"), "inner")
    val salted = Skew.saltedJoin(big, small, Seq("k"), saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("saltedJoin left join preserves unmatched big-side rows") {
    val big = spark.range(100).select(($"id" % 5).as("k"), $"id".as("v"))
    val small = Seq((0L, "a"), (1L, "b")).toDF("k", "name")
    val plain = big.join(small, Seq("k"), "left")
    val salted = Skew.saltedJoin(big, small, Seq("k"), 4, "left")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("skewStats measures the hot-key distribution exactly") {
    // 100 rows: key 1 holds 91, keys 2..10 hold 1 each
    val df = spark.range(100)
      .select(when($"id" < 91, 1L).otherwise($"id" - 89).as("k"))
    val s = Skew.skewStats(df, "k", topK = 10)
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(s == ((10L, 100L, 91L, 10.0, 9.1, 1.0)))
    // topK = 1 isolates the hot key's share
    val top1 = Skew.skewStats(df, "k", topK = 1)
      .select("top_share").as[Double].collect().head
    assert(top1 == 0.91)
  }

  test("bucketed join plans without a shuffle exchange") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    Bucketed.writeBucketed(o, "orders_b", "o_orderkey", 4)
    Bucketed.writeBucketed(l.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 4)
    try {
      val joined = Bucketed.table(spark, "orders_b")
        .join(Bucketed.table(spark, "lineitem_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it still returns the right rows
      val expected = o.join(l.withColumnRenamed("l_orderkey", "o_orderkey"),
        "o_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
