package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (names carry the
  * §2 id); `oracleSql` holds the DuckDB-equivalent SQL over the same
  * parquet tables, with identical column aliases and ORDER BY so the
  * driver's sorted-column hash compare is deterministic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"          -> (Relational.q1Agg _),
    "s3_parquet_scan" -> (Relational.s3ParquetScan _),
    "p2_select"       -> (Relational.p2Select _),
    "p5_between"      -> (Relational.p5Between _),
    "p6p7p8_predicates" -> (Relational.p6p7p8Predicates _),
    "f_scalar_fns"    -> (Relational.fScalarFns _),
    "a1_mode"         -> (Relational.a1Mode _),
    "a2_mean"         -> (Relational.a2Mean _),
    "a4_topk_freq"    -> (Relational.a4TopK _),
    "a5_distinct"     -> (Relational.a5Distinct _),
    "a6_summary"      -> (Relational.a6Summary _),
    "a9_percentile"   -> (Relational.a9Percentile _),
    "j1_left_join"    -> (Relational.j1LeftJoin _),
    "j2_inner_join"   -> (Relational.j2InnerJoin _),
    "j3_semi_join"    -> (Relational.j3SemiJoin _),
    "j4_anti_join"    -> (Relational.j4AntiJoin _),
    "o1_topk_limit"   -> (Relational.o1TopkLimit _),
    "u2_union"        -> (Relational.u2Union _),
    "w1_row_number"   -> (Relational.w1RowNumber _),
    "w2_in_subquery"  -> (Relational.w2InSubquery _),
    "w3_running_sum"  -> (Relational.w3RunningSum _),
    "r3_distinct"     -> (Relational.r3Distinct _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "s3_parquet_scan" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "p2_select" ->
      "SELECT c_custkey, c_mktsegment FROM customer ORDER BY c_custkey",
    "p5_between" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p6p7p8_predicates" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        |WHERE o_orderstatus = 'F' AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_custkey IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
    "f_scalar_fns" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000 THEN 'high'
        |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS price_band,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
        |  round((2002 - year(o_orderdate)) * 12 + (1 - month(o_orderdate))
        |    + CASE WHEN day(o_orderdate) = 1 THEN 0.0
        |           ELSE (1 - day(o_orderdate)) / 31.0 END, 6) AS months_ago,
        |  upper(trim(o_orderpriority)) AS prio_norm,
        |  coalesce(o_orderstatus, 'MISSING') AS status_filled,
        |  CAST(regexp_extract(o_orderpriority, '^(\d+)', 1) AS INTEGER) AS prio_rank
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin,
    "a1_mode" ->
      """SELECT o_orderpriority FROM orders GROUP BY o_orderpriority
        |ORDER BY count(*) DESC, o_orderpriority ASC LIMIT 1""".stripMargin,
    "a2_mean" ->
      "SELECT round(avg(l_quantity), 6) AS avg_qty FROM lineitem",
    "a4_topk_freq" ->
      """SELECT p_brand, count(*) AS cnt FROM part GROUP BY p_brand
        |ORDER BY cnt DESC, p_brand ASC LIMIT 10""".stripMargin,
    "a5_distinct" ->
      "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority",
    "a6_summary" ->
      """SELECT c_mktsegment,
        |  count(*) AS n,
        |  round(avg(c_acctbal), 6) AS avg_bal,
        |  round(min(c_acctbal), 4) AS min_bal,
        |  round(max(c_acctbal), 4) AS max_bal,
        |  round(stddev(c_acctbal), 6) AS std_bal,
        |  round(sum(c_acctbal), 4) AS sum_bal
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY avg_bal DESC, c_mktsegment ASC""".stripMargin,
    "a9_percentile" ->
      """SELECT
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        |  round(quantile_cont(o_totalprice, 0.90), 4) AS p90
        |FROM orders""".stripMargin,
    "j1_left_join" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  round(sum(c_acctbal), 4) AS sum_bal
        |FROM customer
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "j2_inner_join" ->
      """SELECT o_orderstatus, count(*) AS n_lines,
        |  round(sum(l_extendedprice), 4) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "j3_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,
    "j4_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "o1_topk_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "u2_union" ->
      """SELECT o_orderstatus, count(*) AS n FROM (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  UNION ALL
        |  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        |) GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "w1_row_number" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk = 1 ORDER BY o_custkey""".stripMargin,
    "w2_in_subquery" ->
      """SELECT strftime(o_orderdate, '%Y-%m-%d') AS o_day, count(*) AS n,
        |  round(sum(o_totalprice), 4) AS sum_price
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) IN (
        |  SELECT DISTINCT CAST(o_orderdate AS DATE) FROM orders
        |  ORDER BY 1 DESC LIMIT 30)
        |GROUP BY 1 ORDER BY o_day""".stripMargin,
    "w3_running_sum" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_qty,
        |  lag(l_quantity, 1) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS prev_qty
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "r3_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
