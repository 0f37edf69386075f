package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{ColumnOps, Imputation}

/** Silver-layer cleaners — one per source table, same semantics as the
  * reference's silver_*.py, re-expressed as single declarative chains.
  *
  * Scale notes: every step here is map-side (drops, flags, parses, const
  * fills) except the imputation statistics — mode (ONE single-pass
  * aggregation for all 9 columns via Imputation.modesOf, vs. the
  * reference's 9 separate jobs) and mean (one aggregate). Nothing
  * shuffles the table itself.
  */
object Silver {

  /** silver_credit_history.py: drop 8 red-flagged cols; mort_acc missing
    * flag; parse earliest_cr_line "MMM-yyyy"; months_since feature
    * (fill 999); mode-impute 9 cols; fill −1 on 11; mort_acc fill 0. */
  def creditHistory(df: DataFrame): DataFrame = {
    val cleaned = df
      .drop(Schemas.creditDropped: _*)
      .withColumn("mort_acc_missing", ColumnOps.missingFlag("mort_acc"))
      // try_to_date, not to_date: Spark 4 ANSI mode would THROW on a
      // malformed month-year string where the reference yields null →
      // 999 fill (silver_credit_history.py:23, 27)
      .withColumn("earliest_cr_line",
        expr("try_to_date(earliest_cr_line, 'MMM-yyyy')"))
      .withColumn("months_since_earliest_cr_line",
        months_between(col("snapshot_date"), col("earliest_cr_line")))
      .na.fill(Map("months_since_earliest_cr_line" -> 999.0))
      .na.fill(Schemas.creditFillMinus1.map(_ -> -1).toMap[String, Any])
      .na.fill(Map("mort_acc" -> 0))
    Imputation.modeImpute(cleaned, Schemas.creditModeImputed)
  }

  /** silver_demographic.py: drop 9; emp_title null→MISSING + trim/upper;
    * emp_length + home_ownership fill MISSING. */
  def demographic(df: DataFrame): DataFrame =
    df.drop(Schemas.demographicDropped: _*)
      .withColumn("emp_title", upper(trim(coalesce(col("emp_title"), lit("MISSING")))))
      .na.fill(Map("emp_length" -> "MISSING", "home_ownership" -> "MISSING"))

  /** silver_financial.py: drop 2 joint cols; 3 missing flags; dti
    * mean-impute; fill 0 on 26 (incl all_util); fill −1 on 14 (incl
    * il_util, bc_util). */
  def financial(df: DataFrame): DataFrame = {
    val flagged = df
      .drop("dti_joint", "revol_bal_joint")
      .withColumn("all_util_missing", ColumnOps.missingFlag("all_util"))
      .withColumn("il_util_missing", ColumnOps.missingFlag("il_util"))
      .withColumn("bc_util_missing", ColumnOps.missingFlag("bc_util"))
    Imputation.meanImpute(flagged, "dti")
      .na.fill((Schemas.financialFill0 :+ "all_util").map(_ -> 0.0).toMap[String, Any])
      .na.fill((Schemas.financialFillMinus1 ++ Seq("il_util", "bc_util"))
        .map(_ -> -1.0).toMap[String, Any])
  }

  /** silver_loan_terms.py: drop 37 leakage cols; 4 binary encodes. */
  def loanTerms(df: DataFrame): DataFrame =
    df.drop(Schemas.loanDropped: _*)
      .withColumn("pymnt_plan", ColumnOps.binaryFlag(col("pymnt_plan"), "y"))
      .withColumn("debt_settlement_flag",
        ColumnOps.binaryFlag(col("debt_settlement_flag"), "Y"))
      .withColumn("initial_list_status",
        ColumnOps.binaryFlag(col("initial_list_status"), "w"))
      .withColumn("disbursement_method",
        ColumnOps.binaryFlag(col("disbursement_method"), "DirectPay"))
}
