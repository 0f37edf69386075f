package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable column-level operators re-expressing the reference's
  * silver/gold cleaning semantics (SURVEY.md §2.3, §2.10) as pure
  * Catalyst expressions — no UDFs, fully codegen'd.
  */
object ColumnOps {

  /** Missing-flag column: 1 when null else 0
    * (silver_credit_history.py:19, silver_financial.py:15–17). */
  def missingFlag(c: String): Column =
    when(col(c).isNull, 1).otherwise(0)

  /** `parse_emp_length` (gold_feature_store.py:128–146) as a native
    * expression chain instead of the reference's Python scalar UDF:
    * "10+ years"→10, "< 1 year"→0, "missing"→−1, "N years"→N, else −1,
    * null→null. Codegen-friendly; no serialization boundary. */
  def parseEmpLength(c: Column): Column = {
    val s = lower(trim(c))
    when(c.isNull, lit(null).cast("int"))
      .when(s === "10+ years", 10)
      .when(s === "< 1 year", 0)
      .when(s === "missing", -1)
      .otherwise(
        // try_cast: a digit run longer than Int.MaxValue must fall back
        // to −1 (ANSI cast would throw), matching the reference UDF and
        // the TRY_CAST in the m5 oracle
        coalesce(nullif(regexp_extract(s, "^(\\d+)", 1), lit("")).try_cast("int"),
          lit(-1)))
  }

  /** Deterministic one-hot over a FIXED category dictionary
    * (SURVEY §7: replaces the reference's per-batch Pipeline.fit whose
    * column meanings drift week to week). Unknown values → all zeros,
    * mirroring handleInvalid="keep" + zero-fill at serve time. */
  def oneHot(c: String, categories: Seq[String]): Seq[Column] =
    categories.map(cat =>
      when(col(c) === cat, 1).otherwise(0).as(s"${c}_ohe_$cat"))

  /** Closed-form label map (gold_loan_terms.py:18–26 A–G→0–6 shape). */
  def labelMap(c: Column, mapping: Seq[(String, Int)]): Column =
    mapping.foldLeft(lit(null).cast("int")) { case (acc, (k, v)) =>
      when(c === k, v).otherwise(acc)
    }

  /** Binary y/n-style encode (silver_loan_terms.py:23–26). */
  def binaryFlag(c: Column, oneValue: String): Column =
    when(c === oneValue, 1).otherwise(0)

  /** Binary target derivation (model_operations.py:96):
    * membership in the "bad" label set → 1 else 0. */
  def binaryTarget(c: Column, positives: Seq[String]): Column =
    c.isin(positives: _*).cast("int")

  /** months_between with month-floor on both sides
    * (gold_feature_store.py:68–73). */
  def monthsSince(ref: Column, d: Column): Column =
    months_between(trunc(ref, "MM"), trunc(d, "MM"))

  /** Serve-time schema reconciliation (model_inference_utils.py:62–65,
    * weekly_evaluation.py:224–229): a model's persisted feature_names is
    * the contract — features missing from the batch are injected as 0,
    * extra columns are dropped, order follows the contract. */
  def reconcileFeatures(df: DataFrame, featureNames: Seq[String],
                        keep: Seq[String] = Seq("id")): DataFrame = {
    val present = df.columns.toSet
    val cols =
      keep.filter(present).map(col) ++
        featureNames.map(n =>
          if (present(n)) col(n) else lit(0.0).as(n))
    df.select(cols: _*)
  }
}
