package graft.pipeline

import org.apache.spark.sql.types._

/** Explicit StructTypes for the four feature sources (FIXTURES.md §1–4;
  * reconstructed from the reference's silver drop/impute lists and the
  * gold type dictionaries, gold_feature_store.py:38–63, 82–93, 183–231,
  * 238–257). The engine bans inferSchema (SURVEY §1.3): schema is a
  * declared contract, drift is an error, not a silent retype.
  */
object Schemas {
  private def s(n: String) = StructField(n, StringType)
  private def i(n: String) = StructField(n, IntegerType)
  private def f(n: String) = StructField(n, FloatType)
  private def d(n: String) = StructField(n, DateType)

  /** Columns mode-imputed at silver (silver_credit_history.py:31–37). */
  val creditModeImputed: Seq[String] = Seq(
    "inq_last_6mths", "acc_now_delinq", "delinq_2yrs", "pub_rec",
    "collections_12_mths_ex_med", "chargeoff_within_12_mths", "tax_liens",
    "pub_rec_bankruptcies", "delinq_amnt")

  /** Columns filled −1 at silver (silver_credit_history.py:40–44). */
  val creditFillMinus1: Seq[String] = Seq(
    "inq_last_12m", "num_tl_op_past_12m", "inq_fi", "mths_since_last_delinq",
    "mths_since_recent_inq", "mths_since_rcnt_il", "mths_since_recent_bc",
    "num_tl_120dpd_2m", "num_tl_30dpd", "num_tl_90g_dpd_24m",
    "num_accts_ever_120_pd")

  /** Red-flagged columns dropped at silver (silver_credit_history.py:11–16). */
  val creditDropped: Seq[String] = Seq(
    "last_credit_pull_d", "mths_since_last_record", "mths_since_last_major_derog",
    "mths_since_recent_bc_dlq", "mths_since_recent_revol_delinq",
    "sec_app_chargeoff_within_12_mths", "sec_app_collections_12_mths_ex_med",
    "sec_app_mths_since_last_major_derog")

  val creditHistoryRaw: StructType = StructType(
    Seq(s("member_id"), d("snapshot_date"), s("earliest_cr_line"), i("mort_acc")) ++
      creditModeImputed.map(i) ++ creditFillMinus1.map(i) ++
      (s(creditDropped.head) +: creditDropped.tail.map(i)))

  val demographicDropped: Seq[String] = Seq(
    "annual_inc_joint", "verification_status_joint", "sec_app_earliest_cr_line",
    "sec_app_inq_last_6mths", "sec_app_mort_acc", "sec_app_open_acc",
    "sec_app_revol_util", "sec_app_open_act_il", "sec_app_num_rev_accts")

  val demographicRaw: StructType = StructType(Seq(
    s("member_id"), d("snapshot_date"), s("emp_title"), s("emp_length"),
    s("home_ownership"), f("annual_inc"), s("verification_status"),
    s("addr_state"), s("application_type"), s("zip_code"),
    f("annual_inc_joint"), s("verification_status_joint"),
    s("sec_app_earliest_cr_line"), i("sec_app_inq_last_6mths"),
    i("sec_app_mort_acc"), i("sec_app_open_acc"), f("sec_app_revol_util"),
    i("sec_app_open_act_il"), i("sec_app_num_rev_accts")))

  /** Filled 0 at silver (silver_financial.py:24–30). */
  val financialFill0: Seq[String] = Seq(
    "revol_util", "total_rev_hi_lim", "tot_coll_amt", "tot_cur_bal",
    "avg_cur_bal", "max_bal_bc", "open_acc", "total_acc", "open_acc_6m",
    "open_act_il", "open_il_12m", "open_il_24m", "open_rv_12m", "open_rv_24m",
    "acc_open_past_24mths", "num_actv_bc_tl", "num_actv_rev_tl",
    "num_rev_accts", "num_rev_tl_bal_gt_0", "num_il_tl", "num_bc_tl",
    "num_op_rev_tl", "num_sats", "num_bc_sats", "total_cu_tl")

  /** Filled −1 at silver (silver_financial.py:33–38). */
  val financialFillMinus1: Seq[String] = Seq(
    "total_bal_il", "total_bal_ex_mort", "total_bc_limit",
    "total_il_high_credit_limit", "tot_hi_cred_lim", "mo_sin_old_il_acct",
    "mo_sin_old_rev_tl_op", "mo_sin_rcnt_rev_tl_op", "mo_sin_rcnt_tl",
    "bc_open_to_buy", "percent_bc_gt_75", "pct_tl_nvr_dlq")

  val financialRaw: StructType = StructType(
    Seq(s("member_id"), d("snapshot_date"), f("dti"), f("all_util"),
      f("il_util"), f("bc_util"), f("revol_bal"), f("dti_joint"),
      f("revol_bal_joint")) ++
      financialFill0.map(f) ++ financialFillMinus1.map(f))

  /** Leakage/hardship/settlement columns dropped at silver
    * (silver_loan_terms.py:11–20). */
  val loanDropped: Seq[String] = Seq(
    "url", "desc", "title", "hardship_flag", "hardship_type", "hardship_reason",
    "hardship_status", "deferral_term", "hardship_amount", "hardship_start_date",
    "hardship_end_date", "payment_plan_start_date", "hardship_length",
    "hardship_dpd", "hardship_loan_status",
    "orig_projected_additional_accrued_interest", "hardship_payoff_balance_amount",
    "hardship_last_payment_amount", "debt_settlement_flag_date",
    "settlement_status", "settlement_date", "settlement_amount",
    "settlement_percentage", "settlement_term", "out_prncp", "out_prncp_inv",
    "total_pymnt", "total_pymnt_inv", "total_rec_prncp", "total_rec_int",
    "total_rec_late_fee", "recoveries", "collection_recovery_fee",
    "last_pymnt_d", "next_pymnt_d", "last_pymnt_amnt", "policy_code")

  val loanTermsRaw: StructType = StructType(
    Seq(s("id"), s("member_id"), d("snapshot_date"), f("loan_amnt"),
      f("funded_amnt"), f("funded_amnt_inv"), s("term"), f("int_rate"),
      f("installment"), s("grade"), s("sub_grade"), s("issue_d"),
      s("loan_status"), s("purpose"), s("pymnt_plan"),
      s("debt_settlement_flag"), s("initial_list_status"),
      s("disbursement_method")) ++ loanDropped.map(s))

  /** Fixed OHE dictionaries (SURVEY §7: deterministic replacements for
    * the reference's per-batch Pipeline.fit). */
  val homeOwnershipCats = Seq("RENT", "OWN", "MORTGAGE", "ANY", "NONE", "OTHER", "MISSING")
  val verificationStatusCats = Seq("Verified", "Source Verified", "Not Verified")
  val applicationTypeCats = Seq("Individual", "Joint App")
  val gradeMapping: Seq[(String, Int)] =
    Seq("A" -> 0, "B" -> 1, "C" -> 2, "D" -> 3, "E" -> 4, "F" -> 5, "G" -> 6)
}
