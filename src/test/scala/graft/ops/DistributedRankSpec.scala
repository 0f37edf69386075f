package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec

/** The distributed rank primitive must equal the plain
  * `Window.partitionBy(g).orderBy(o)` rank/cumsum to the bit (the
  * oracle-gate contract) while never sorting a whole group in one
  * task (the 100 TB contract — a crawl is ~45% one language).
  */
class DistributedRankSpec extends SparkSpec {
  import spark.implicits._

  // plan.collect stops at QueryStageExec leaves under AQE — walk
  // through adaptive wrappers explicitly to reach every WindowExec
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  private def windowExecs(plan: SparkPlan): Seq[WindowExec] =
    allNodes(plan).collect { case w: WindowExec => w }

  test("rank and cumsum equal the plain window, including a NULL group") {
    val df = Seq(
      ("en", 1L, 10L), ("en", 2L, 20L), ("en", 3L, 5L), ("en", 4L, 7L),
      ("fr", 5L, 1L), ("fr", 6L, 2L),
      (null.asInstanceOf[String], 7L, 3L),
      (null.asInstanceOf[String], 8L, 4L))
      .toDF("lang", "id", "v").repartition(5)

    val got = DistributedRank.withRankAndCumsum(
        df, "lang", Seq(desc("v"), col("id")), Some("v"))
      .select("lang", "id", "_rk", "_cum", "_n")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val w = Window.partitionBy("lang").orderBy(desc("v"), col("id"))
    val want = df.select(col("lang"), col("id"),
        row_number().over(w).cast("long").as("rk"),
        sum("v").over(w.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)).as("cum"),
        count(lit(1)).over(Window.partitionBy("lang")).as("n"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    assert(got == want)
  }

  test("dominant-group skew: 90% one language, rank still exact") {
    // the pathological shard: one language holds 90% of the corpus
    // (the shape that single-tasks a plain partitionBy window)
    val df = spark.range(2000)
      .select(when(col("id") % 10 < 9, "en").otherwise(
          concat(lit("l"), (col("id") % 7).cast("string"))).as("lang"),
        col("id"),
        (xxhash64(col("id")) % 100 + 100).as("v"))
    val got = DistributedRank.withRankAndCumsum(
        df, "lang", Seq(desc("v"), col("id")), Some("v"))
    val w = Window.partitionBy("lang").orderBy(desc("v"), col("id"))
    val want = df.select(col("lang"), col("id"),
      row_number().over(w).cast("long").as("_rk"),
      sum("v").over(w.rowsBetween(
        Window.unboundedPreceding, Window.currentRow)).as("_cum"))
    val mismatches = got.select("lang", "id", "_rk", "_cum")
      .except(want.select("lang", "id", "_rk", "_cum")).count()
    assert(mismatches == 0)
    // every group total is the group's row count
    val ns = got.groupBy("lang").agg(first("_n").as("n"),
        count(lit(1)).as("c"))
      .filter(col("n") =!= col("c")).count()
    assert(ns == 0)
  }

  test("no single-group window sort remains in the physical plan") {
    // every WindowExec must partition by (_pid, group) — ≥2 exprs —
    // so no window group can exceed a range partition's row count
    val df = spark.range(500)
      .select(lit("en").as("lang"), col("id"), lit(1L).as("v"))
    val out = DistributedRank.withRankAndCumsum(
      df, "lang", Seq(col("id")), Some("v"))
    out.collect()
    val ws = windowExecs(out.queryExecution.executedPlan)
    assert(ws.nonEmpty, "expected the local window in the plan")
    ws.foreach { w =>
      assert(w.partitionSpec.length >= 2,
        s"single-column window partition spec (a whole-group sort): $w")
    }
  }

  test("curriculumOrder: the ONE-group global order equals a plain global row_number") {
    // the degenerate limit of the skew fixture: every row in a single
    // rank group — the shape a bare Window.orderBy would single-task
    val df = spark.range(3000)
      .select(col("id"), (xxhash64(col("id")) % 1000).as("difficulty"))
    val got = graft.ops.Sampling.curriculumOrder(
      df, "id", Seq(col("difficulty")))
    val want = df.select(col("id"),
      row_number().over(Window.orderBy(col("difficulty"), col("id")))
        .cast("long").as("position"))
    assert(got.select("id", "position")
      .except(want.select("id", "position")).count() == 0)
    // positions are a dense 1..N permutation
    val n = df.count()
    assert(got.agg(min("position"), max("position"),
      countDistinct("position")).collect()(0).toSeq == Seq(1L, n, n))
    // and the plan never single-tasks: every window partitions ≥ 2 ways
    got.collect()
    windowExecs(got.queryExecution.executedPlan).foreach { w =>
      assert(w.partitionSpec.length >= 2,
        s"global-order window must ride (_pid, group): $w")
    }
  }

  test("ccnetBuckets and unimaxCensus ride the distributed rank") {
    // the two former scale-killer call sites: plan carries no window
    // partitioned by the bare language column
    val docs = Seq((1L, "en", "alpha beta alpha"), (2L, "en", "beta"),
      (3L, "fr", "gamma delta"), (4L, "en", "alpha"))
      .toDF("doc_id", "lang", "text")
    val b = graft.operators.TextAnalysis.ccnetBuckets(
      docs.select(col("doc_id").as("id"), col("lang"),
        length(col("text")).cast("double").as("s")), "lang", "s", "id")
    b.collect()
    windowExecs(b.queryExecution.executedPlan).foreach { w =>
      assert(w.partitionSpec.length >= 2, s"bare-group window: $w")
    }
    val u = Sampling.unimaxCensus(docs, "doc_id", "lang", "text",
      budgetTokens = 5L, maxEpochs = 2)
    u.collect()
    windowExecs(u.queryExecution.executedPlan).foreach { w =>
      assert(w.partitionSpec.length >= 2, s"bare-group window: $w")
    }
  }

  test("quota draws ride the distributed rank: 90%-one-domain fixture, " +
    "bit-identical to the plain window, no bare-group window in plan") {
    // the DoReMi / quota-mix shape: one domain (CommonCrawl / English)
    // is 90% of the corpus — the skew that single-tasks a plain
    // Window.partitionBy(domain).orderBy(md5, key)
    val df = spark.range(2000)
      .select(when(col("id") % 10 < 9, "cc").otherwise(
          concat(lit("src"), (col("id") % 5).cast("string"))).as("src"),
        col("id"), concat(lit("tok"), (col("id") % 31).cast("string"),
          lit(" word")).as("text"))
    val mdw = Window.partitionBy("src")
      .orderBy(md5(col("id").cast("string").cast("binary")), col("id"))

    val q = Sampling.quotaSample(df, "src", "id", 25)
    val qWant = df.withColumn("_r", row_number().over(mdw))
      .filter(col("_r") <= 25).drop("_r")
    assert(q.select("src", "id").except(qWant.select("src", "id"))
      .count() == 0 && q.count() == qWant.count())
    assert(q.columns.toSeq == df.columns.toSeq, "payload columns survive")

    val t = Sampling.temperatureMix(df, "src", "id", 0.5, 400)
    val counts = df.groupBy("src").agg(count(lit(1)).as("_n"))
    val wsum = Window.partitionBy()
    val tq = counts.withColumn("_w", pow(col("_n"), 0.5) /
        sum(pow(col("_n"), 0.5)).over(wsum))
      .withColumn("_quota", greatest(lit(1L), least(col("_n"),
        floor(lit(400.0) * col("_w")))).cast("long"))
      .select(col("src"), col("_quota"))
    val tWant = df.join(broadcast(tq), Seq("src"))
      .withColumn("_r", row_number().over(mdw))
      .filter(col("_r") <= col("_quota")).drop("_r", "_quota")
    assert(t.select("src", "id").except(tWant.select("src", "id"))
      .count() == 0 && t.count() == tWant.count())

    val m = Sampling.doremiMix(df, "src", "id", "text", 400,
      eta = 5.0, smoothing = 0.2)
    assert(m.columns.toSeq == Seq("src", "id"))
    assert(m.count() > 0 && m.select("src").distinct().count() ==
      df.select("src").distinct().count(),
      "every domain keeps >= 1 row (the floor-at-1 rule)")

    // the plan contract: NO window in any of the three partitions on
    // the bare domain column — every WindowExec either rides
    // (_pid, group) or runs over the <= K*256-row weights frame
    // (doremiWeights' bounded aggregate, partitionSpec length <= 1 but
    // input is corpus-size-independent). Identify the weights windows
    // by their aggregate-frame columns.
    Seq(q, t, m).foreach(_.collect())
    Seq("quota" -> q, "temp" -> t).foreach { case (nm, d) =>
      windowExecs(d.queryExecution.executedPlan).foreach { w =>
        // temperatureMix's quota math runs a global sum over the
        // |groups|-row counts frame — bounded input, identified by the
        // counts column _n in its child output
        val kid = w.child.output.map(_.name)
        val overCounts = kid.contains("_n") && !kid.contains("_rkoff")
        assert(w.partitionSpec.length >= 2 || overCounts,
          s"$nm: bare-group window (dominant-domain single task): $w")
      }
    }
    windowExecs(m.queryExecution.executedPlan).foreach { w =>
      // doremiWeights' windows all run over the <= K*256-row
      // (domain, bucket, count) aggregate frame — identified by its
      // _c/_b/_totd/excess columns, never present on the corpus side
      val kid = w.child.output.map(_.name)
      val overWeights = kid.exists(n => n == "_c" || n == "_b" ||
        n == "_totd" || n == "_term" || n == "excess" || n == "_e")
      assert(w.partitionSpec.length >= 2 || overWeights,
        s"doremiMix: corpus-sized bare-group window: $w")
    }
  }

  test("unimaxCensus survives a NULL language row (driver sort guard)") {
    val docs = Seq((1L, "en", "a b c"), (2L, null.asInstanceOf[String],
      "d e"), (3L, "fr", "f")).toDF("doc_id", "lang", "text")
    // must not NPE; null-lang rows are censused under the null key
    val out = Sampling.unimaxCensus(docs, "doc_id", "lang", "text",
      budgetTokens = 100L, maxEpochs = 1)
    assert(out.count() == 3)
  }

  test("unimaxCensus survives null-text and all-empty languages") {
    // a NULL text counts zero tokens (empty STRINGS count 1 — the
    // split-of-trim convention); a language whose EVERY doc is null
    // has tot = 0 and must alloc 0, not crash the driver on integer
    // division by zero
    val docs = Seq((1L, "en", "a b c"), (2L, "en", null.asInstanceOf[String]),
      (3L, "zz", null.asInstanceOf[String]),
      (4L, "zz", null.asInstanceOf[String])).toDF("doc_id", "lang", "text")
    val out = Sampling.unimaxCensus(docs, "doc_id", "lang", "text",
        budgetTokens = 10L, maxEpochs = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // zz: cap 0, alloc 0, zero tokens selected (empty docs may ride
    // the zero-cost prefix — cum 0 ≤ rem 0 — but contribute nothing)
    assert(out("zz")._1 == 0L && out("zz")._2 == 0L && out("zz")._4 == 0L,
      s"empty lang census: $out")
    // en: 3 real tokens (null text = 0), cap = 6; zz (cap 0) fills
    // first, so en gets min(6, 10/1) = 6 — its full 2-epoch cap
    assert(out("en")._1 == 6L && out("en")._2 == 6L && out("en")._4 == 6L,
      s"en gets its full 2-epoch cap: $out")
  }
}
