package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.ops.{ColumnOps, Imputation}
import graft.metrics.Psi

/** ML-feature operator inventory (SURVEY §2.3 F10/F12, §2.4 A1/A7/A9,
  * §2.10 M1–M8) exercised over the TESTDATA corpus with DuckDB oracles.
  * The reference's domain columns (emp_length, grade, …) are emulated by
  * deterministic synthesis from testdata columns so the *operator*
  * semantics are what's tested.
  */
object MLFeatures {

  /** M5/F12 — parse_emp_length as a native expression. Strings are
    * synthesized from p_size, then parsed back. */
  def m5ParseEmpLength(s: SparkSession, d: String): DataFrame = {
    val raw = Tables.part(s, d)
      .withColumn("emp_length",
        when(col("p_size") >= 40, "10+ years")
          .when(col("p_size") === 1, "< 1 year")
          .when(col("p_size") % 7 === 0, "missing")
          .when(col("p_size") % 11 === 0, "garbage value")
          .otherwise(concat(col("p_size").cast("string"), lit(" years"))))
    raw.select(
        col("p_partkey"),
        col("emp_length"),
        ColumnOps.parseEmpLength(col("emp_length")).as("emp_length_int"))
      .orderBy("p_partkey")
  }

  /** A1 (single-pass, multi-column) — all modes in ONE aggregation
    * instead of the reference's job-per-column loop. */
  def a1ModesMulti(s: SparkSession, d: String): DataFrame =
    Imputation.modesOf(
        Tables.lineitem(s, d),
        Seq("l_returnflag", "l_linestatus", "l_quantity"))
      .orderBy("col_name")

  /** A2/F10 — mean-imputation + missing flags end-to-end: nulls are
    * induced with nullif, flagged, then filled with the global mean. */
  def opsMeanImpute(s: SparkSession, d: String): DataFrame = {
    val withNulls = Tables.lineitem(s, d)
      .withColumn("disc", nullif(col("l_discount"), lit(0.05)))
      .withColumn("disc_missing", ColumnOps.missingFlag("disc"))
    val filled = Imputation.meanImpute(withNulls, "disc")
    filled.agg(
      round(sum("disc"), 4).as("sum_disc"),
      sum("disc_missing").as("n_filled"),
      count(lit(1)).as("n"))
  }

  /** M1 — StringIndexer semantics: frequency-ordered index (most frequent
    * → 0), ties by value. The model is the (value, idx) mapping itself. */
  def m1StringIndexer(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(desc("cnt"), asc("c_mktsegment"))
    Tables.customer(s, d)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
      .withColumn("idx", row_number().over(w) - 1)
      .select("c_mktsegment", "idx", "cnt")
      .orderBy("idx")
  }

  /** M2 — deterministic one-hot over a fixed dictionary (no per-batch
    * fit; unknowns → all-zeros). */
  def m2OneHot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") <= 200)
      .select(
        Seq(col("o_orderkey"), col("o_orderstatus")) ++
          ColumnOps.oneHot("o_orderstatus", Seq("F", "O", "P")): _*)
      .orderBy("o_orderkey")

  /** M6 — label encoding from sorted-unique values (grade_mapping
    * semantics): tiny distinct set → windowed rank on the dim side →
    * broadcast join back. No global window over the fact table. */
  def m6LabelEncode(s: SparkSession, d: String): DataFrame = {
    val mapping = Tables.customer(s, d)
      .select("c_mktsegment").distinct()
      .withColumn("label_idx",
        row_number().over(Window.orderBy("c_mktsegment")) - 1)
    Tables.customer(s, d)
      .join(broadcast(mapping), Seq("c_mktsegment"))
      .groupBy("c_mktsegment", "label_idx").agg(count(lit(1)).as("n"))
      .orderBy("label_idx")
  }

  /** M7 — binary target from label-set membership. */
  def m7BinaryTarget(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(ColumnOps.binaryTarget(col("c_mktsegment"),
        Seq("AUTOMOBILE", "BUILDING")).as("target"))
      .agg(count(lit(1)).as("n"))
      .orderBy("target")

  /** M8/A9 — PSI between two time-sliced populations of o_totalprice. */
  def m8Psi(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val cut = to_timestamp(lit("1998-01-01 00:00:00"))
    Psi.psi(
      o.filter(col("o_orderdate") < cut).select(col("o_totalprice").as("v")),
      o.filter(col("o_orderdate") >= cut).select(col("o_totalprice").as("v")),
      "v")
  }

  /** A7 — value_counts (predictions-distribution shape) on events. */
  def a7ValueCounts(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("event_type"))

  /** R1 — seeded Bernoulli sample, hard-gated by a binomial CI.
    * RNG streams differ across engines by design, so the oracle cannot
    * recompute the sampled SET — but it CAN pin what a healthy sampler
    * must produce: per class, the sampled count within ±5σ of n·p
    * (σ = √(n·p·(1−p)), +1 for tiny classes). The query emits
    * (class, n_total, within_ci) where within_ci is 1 iff the draw is in
    * bounds; the oracle computes the same classes and totals and expects
    * within_ci = 1 everywhere. A broken sampler (wrong fraction, empty,
    * or pass-through) flips the flag → hash mismatch. The exact-count
    * determinism contract (same seed + partitioning ⇒ same rows) stays
    * spec-asserted. */
  def r1Sample(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val p = 0.1
    val sampled = graft.ops.Sampling.bernoulli(orders, p, seed = 42L)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n_sampled"))
    orders.groupBy("o_orderstatus").agg(count(lit(1)).as("n_total"))
      .join(sampled, Seq("o_orderstatus"), "left")
      .na.fill(0L, Seq("n_sampled"))
      .select(col("o_orderstatus"), col("n_total"),
        when(abs(col("n_sampled") - col("n_total") * p) <=
          lit(5.0) * sqrt(col("n_total") * p * (1 - p)) + 1.0, 1)
          .otherwise(0).as("within_ci"))
      .orderBy("o_orderstatus")
  }

  /** M9 — classification metric family, fully distributed and
    * driver-gated: a deterministic prediction fixture (labels =
    * o_orderstatus; every 10th order key mis-predicts via the rotation
    * F→O→P→F) feeds `Classification.confusion` →
    * `Classification.perClassMetrics` — per-class precision/recall/F1
    * with NO driver collect, the shape that survives 10⁵-label
    * families. DuckDB recomputes the fixture and the metric algebra
    * verbatim (ratios of exact integer counts are bit-identical;
    * rounding only at the end). The 7-grade sklearn-parity path
    * (`summarize`) stays spec-checked in AnalyticsSpec. */
  def m9ClassMetrics(s: SparkSession, d: String): DataFrame = {
    import graft.metrics.Classification
    val preds = Tables.orders(s, d).select(
      col("o_orderstatus").as("label"),
      when(col("o_orderkey") % 10 === 0,
        when(col("o_orderstatus") === "F", "O")
          .when(col("o_orderstatus") === "O", "P")
          .otherwise("F"))
        .otherwise(col("o_orderstatus")).as("prediction"))
    Classification.perClassMetrics(
        Classification.confusion(preds, "label", "prediction"))
      .orderBy("cls")
  }

  /** R2 — deterministic hash split: per-class train/test counts.
    * Membership is the md5-threshold rule (Sampling.portableTestMember),
    * so the DuckDB oracle recomputes the EXACT member set — the split is
    * hard-gated end to end, not just spec-asserted. */
  def r2HashSplit(s: SparkSession, d: String): DataFrame = {
    val (train, test) = graft.ops.Sampling.hashSplit(
      Tables.customer(s, d), "c_custkey", testPct = 20)
    train.groupBy("c_mktsegment").agg(count(lit(1)).as("n_train"))
      .join(test.groupBy("c_mktsegment").agg(count(lit(1)).as("n_test")),
        Seq("c_mktsegment"), "left")
      .na.fill(0L)
      .orderBy("c_mktsegment")
  }
}
