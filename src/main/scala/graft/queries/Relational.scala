package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** The relational operator inventory of SURVEY.md §2 (scans, projections,
  * predicates, scalar functions, aggregations, joins, sorts, sets, windows,
  * dedup), re-expressed Spark-first over the TESTDATA corpus. Each method is
  * one `SparkEntry.queries` entry with a DuckDB oracle.
  *
  * Conventions for oracle parity:
  *  - every query ends in a total ORDER BY so row order is deterministic;
  *  - float aggregates are rounded (4–6 dp) to absorb summation-order ULPs;
  *  - aggregate/computed columns are aliased identically on both sides.
  *
  * Scale notes are per-query; the common theme is: filters/projections sit
  * directly on the parquet scan (pushdown + pruning), aggregations are
  * partial-agg friendly, small dimensions broadcast.
  */
object Relational {
  private val ts = (s: String) => to_timestamp(lit(s))

  /** S3 — parquet scan, smallest table. Whole table fits in one partition;
    * at scale this is a metadata-only pruned scan of a dimension. */
  def s3ParquetScan(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).orderBy("r_regionkey")

  /** P1/P2 — projection (column pruning reaches the scan: ReadSchema shows
    * only 2 of 5 customer columns). */
  def p2Select(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")

  /** P5 — date-range predicate; pushed to parquet (PushedFilters). */
  def p5Between(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate").between(ts("1996-01-01 00:00:00"), ts("1996-12-31 23:59:59")))
      .select("l_orderkey", "l_linenumber", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  /** P6/P7/P8 — equality + IN-list + null-handling predicates combined. */
  def p6p7p8Predicates(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .filter(col("o_custkey").isNotNull)
      .select("o_orderkey", "o_custkey", "o_orderpriority")
      .orderBy("o_orderkey")

  /** Flagship: TPC-H Q1-shaped grouped aggregation (SURVEY A2/A3/A6 family).
    * Partial aggregation map-side, 6 groups → trivial shuffle; the scan
    * reads only the 7 referenced columns. */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** A1 — mode via group-count-sort-first (silver_credit_history.py:31–37
    * semantics), tie broken by value for determinism. */
  def a1Mode(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("o_orderpriority"))
      .limit(1)
      .select("o_orderpriority")

  /** A2 — scalar mean (mean-imputation statistic, silver_financial.py:20). */
  def a2Mean(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).agg(round(avg("l_quantity"), 6).as("avg_qty"))

  /** A4/O1 — top-K by frequency (top-10 emp_title, gold_feature_store.py:98).
    * Catalyst plans TakeOrderedAndProject: no full sort, no full shuffle. */
  def a4TopK(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .groupBy("p_brand").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("p_brand"))
      .limit(10)

  /** A5 — distinct values of a column (silver_processing.py:51). */
  def a5Distinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select("o_orderpriority").distinct()
      .orderBy("o_orderpriority")

  /** A6 — grouped multi-aggregate summary (query_model_performance.py:29–43
    * shape: COUNT/AVG/MIN/MAX/STDDEV/SUM … GROUP BY … ORDER BY avg DESC). */
  def a6Summary(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n"),
        round(avg("c_acctbal"), 6).as("avg_bal"),
        round(min("c_acctbal"), 4).as("min_bal"),
        round(max("c_acctbal"), 4).as("max_bal"),
        round(stddev("c_acctbal"), 6).as("std_bal"),
        round(sum("c_acctbal"), 4).as("sum_bal"))
      .orderBy(desc("avg_bal"), asc("c_mktsegment"))

  /** A9 — exact percentiles (PSI breakpoint computation, model_operations.py:165).
    * `percentile` (exact, interpolated) matches DuckDB quantile_cont. */
  def a9Percentile(s: SparkSession, d: String): DataFrame =
    // ONE array-percentile aggregate: four scalar percentile() calls
    // would each maintain their own value-count buffer over the same
    // column — 4× the aggregation memory and merge work for one answer
    Tables.orders(s, d)
      .agg(expr("percentile(o_totalprice, array(0.25D, 0.50D, 0.75D, 0.90D))")
        .as("_ps"))
      .select(
        round(element_at(col("_ps"), 1), 4).as("p25"),
        round(element_at(col("_ps"), 2), 4).as("p50"),
        round(element_at(col("_ps"), 3), 4).as("p75"),
        round(element_at(col("_ps"), 4), 4).as("p90"))

  /** J1 — multi-way left-join spine (gold_feature_store.py:325–327 shape).
    * nation/region are tiny → Catalyst broadcasts both; customer never
    * shuffles. At 100 TB the fact side streams map-side only. */
  def j1LeftJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"), "left")
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 4).as("sum_bal"))
      .orderBy("r_name", "n_name")

  /** J2 — inner equi-join fact⋈fact (features⋈labels, model_operations.py:39).
    * Both sides large → shuffle hash/sort-merge on the key; AQE picks. */
  def j2InnerJoin(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"), "inner")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_lines"), round(sum("l_extendedprice"), 4).as("sum_price"))
      .orderBy("o_orderstatus")

  /** J3 — left-semi join (EXISTS): orders having at least one high-qty line. */
  def j3SemiJoin(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(
        Tables.lineitem(s, d).filter(col("l_quantity") >= 49),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")

  /** J4 — left-anti join (NOT EXISTS): customers with no orders. */
  def j4AntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** O1/O3 — global top-k by value (TakeOrderedAndProject). */
  def o1TopkLimit(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  /** U2 — union of two partition-like subsets then aggregate (multi-week
    * union, model_operations.py:33–35). */
  def u2Union(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val a = o.filter(col("o_orderdate") < ts("1997-01-01 00:00:00"))
    val b = o.filter(col("o_orderdate") >= ts("1999-01-01 00:00:00"))
    a.unionByName(b)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  /** W1 — ROW_NUMBER() … PARTITION BY … ORDER BY … DESC, keep rank 1
    * (best-model-per-week, query_model_performance.py:147–166). One shuffle
    * on the partition key; no global sort. */
  def w1RowNumber(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey")
  }

  /** W2 — IN-subquery over recent partitions (query_model_performance.py:96);
    * Catalyst rewrites to left-semi against the distinct-orderBy-limit. */
  def w2InSubquery(s: SparkSession, d: String): DataFrame = {
    val recent = Tables.orders(s, d)
      .select(to_date(col("o_orderdate")).as("od")).distinct()
      .orderBy(desc("od")).limit(30)
    Tables.orders(s, d)
      .join(broadcast(recent), to_date(col("o_orderdate")) === col("od"), "left_semi")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_day"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("sum_price"))
      .orderBy("o_day")
  }

  /** W3 — running sum with explicit frame (ROWS UNBOUNDED PRECEDING) +
    * lag(): frame-spec coverage beyond the reference (SURVEY §2.8 note). */
  def w3RunningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 100)
      .withColumn("run_qty",
        round(sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
      .withColumn("prev_qty", lag("l_quantity", 1).over(w))
      .select("l_orderkey", "l_linenumber", "run_qty", "prev_qty")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** R3 — full-row distinct (gold_feature_store.py:330). */
  def r3Distinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** S6/S2 — CSV sink + schema'd scan round-trip: writes supplier to CSV,
    * reads it back with the declared schema, aggregates. The oracle runs
    * the same aggregate on the parquet — proving the CSV path is
    * lossless for the table's types. */
  def s6CsvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val src = Tables.supplier(s, d)
    // per-process fixed path: no /tmp accumulation across runs, no
    // overwrite-while-read race between concurrent Bench/Verify JVMs
    val tmp = sys.props("java.io.tmpdir") +
      s"/graft_${ProcessHandle.current.pid}/csv_roundtrip/supplier"
    graft.sources.Sources.writeCsv(src, tmp)
    graft.sources.Sources.csv(s, tmp, Some(src.schema))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n"), round(sum("s_acctbal"), 4).as("sum_bal"))
      .orderBy("s_nationkey")
  }

  /** F2 — "MMM-yyyy" date parsing (silver_credit_history.py:22 shape):
    * strings synthesized from order dates, parsed back with to_date. */
  def f2DateParse(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") <= 300)
      .withColumn("mmm_yyyy", date_format(col("o_orderdate"), "MMM-yyyy"))
      .select(
        col("o_orderkey"),
        col("mmm_yyyy"),
        date_format(to_date(col("mmm_yyyy"), "MMM-yyyy"), "yyyy-MM-dd").as("parsed"),
        round(months_between(
          to_date(lit("2002-01-01")), to_date(col("mmm_yyyy"), "MMM-yyyy")), 6)
          .as("months_since"))
      .orderBy("o_orderkey")

  /** A-cube — grouping-sets aggregation (beyond the reference: SURVEY
    * §2.4 notes these come free as built-ins). */
  def aCube(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** S5-orc — ORC sink + scan round-trip (third columnar format after
    * parquet/CSV; aggregate parity vs the parquet oracle). */
  def s5OrcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val src = Tables.part(s, d)
    val tmp = sys.props("java.io.tmpdir") +
      s"/graft_${ProcessHandle.current.pid}/orc_roundtrip/part"
    src.write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), round(sum("p_retailprice"), 4).as("sum_price"))
      .orderBy("p_brand")
  }

  /** S5-partitioned — partitionBy write + partition-pruned read: lands
    * orders partitioned by year, reads back ONE partition (the filter on
    * the partition column prunes at planning time), aggregates. */
  def s5PartitionedRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmp = sys.props("java.io.tmpdir") +
      s"/graft_${ProcessHandle.current.pid}/part_roundtrip/orders"
    Tables.orders(s, d)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(tmp)
    s.read.parquet(tmp)
      .filter(col("o_year") === 1997)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  /** S-compact — small-file compaction roundtrip: land documents as 64
    * deliberately-tiny files (the micro-batch-ingest pathology), compact
    * with `Sources.compactParquet` (driver-side file census →
    * shuffle-free coalesce rewrite), read the compacted copy, aggregate
    * per language. The oracle recomputes the aggregate from the
    * original table — compaction must be bit-transparent to content. */
  def sCompactRoundtrip(s: SparkSession, d: String): DataFrame = {
    val base = sys.props("java.io.tmpdir") +
      s"/graft_${ProcessHandle.current.pid}/compact_roundtrip"
    val src = s"$base/documents_small"
    val dst = s"$base/documents_compacted"
    Tables.documents(s, d).repartition(64)
      .write.mode("overwrite").parquet(src)
    graft.sources.Sources.compactParquet(s, src, dst)
    s.read.parquet(dst)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"),
        sum(length(col("text"))).as("sum_text_len"))
      .orderBy("lang")
  }

  /** Z-order roundtrip gate: lineitem rewritten z-clustered on
    * (l_orderkey, l_partkey) must stay content-identical — the layout
    * op may move rows between files, never change them. The pruning
    * benefit itself (per-file min/max ranges shrink on BOTH columns) is
    * spec-asserted in ZorderSpec; DuckDB can't see Spark's file layout,
    * so the oracle pins content transparency. */
  def sZorderRoundtrip(s: SparkSession, d: String): DataFrame = {
    val base = sys.props("java.io.tmpdir") +
      s"/graft_${ProcessHandle.current.pid}/zorder_roundtrip"
    val dst = s"$base/lineitem_z"
    graft.sources.Sources.zorderWrite(
      s, Tables.lineitem(s, d), Seq("l_orderkey", "l_partkey"), dst,
      nFiles = 8)
    s.read.parquet(dst)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_orderkey")).as("sum_ok"),
        sum(col("l_partkey")).as("sum_pk"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  case class LineitemSlim(l_returnflag: String, l_linestatus: String,
                          l_quantity: Double, l_shipdate: java.sql.Timestamp)

  /** Typed sum-of-quantity Aggregator: unlike groupByKey.mapGroups, an
    * Aggregator participates in partial aggregation — Spark combines
    * map-side and shuffles one buffer per (key, partition) instead of
    * every row. This is the plan shape the typed API should model at
    * scale (measured 4× over mapGroups on this very query at sf0.1). */
  private object SumQty extends org.apache.spark.sql.expressions.Aggregator[LineitemSlim, Double, Double] {
    def zero: Double = 0.0
    def reduce(acc: Double, r: LineitemSlim): Double = acc + r.l_quantity
    def merge(a: Double, b: Double): Double = a + b
    def finish(acc: Double): Double = acc
    def bufferEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
    def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  /** Typed Dataset[T] path: the same Q1 shape through case-class
    * Encoders — compile-time column safety where the schema is static.
    * (Quantities are integral-valued, so the double sum is exact and
    * combine order cannot perturb it.) */
  def q1Typed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cutoff = java.sql.Timestamp.valueOf("1998-09-02 00:00:00")
    Tables.lineitem(s, d)
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_shipdate")
      .as[LineitemSlim]
      .filter(_.l_shipdate.compareTo(cutoff) <= 0)
      .groupByKey(r => (r.l_returnflag, r.l_linestatus))
      .agg(SumQty.toColumn.name("sum_qty"))
      .select(col("key._1").as("l_returnflag"), col("key._2").as("l_linestatus"),
        round(col("sum_qty"), 4).as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A-stats — bivariate statistics aggregates: Pearson correlation,
    * sample covariance, least-squares slope/intercept. */
  def aStatsCorr(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qp"),
        round(covar_samp("l_quantity", "l_extendedprice"), 4).as("covar_qp"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"))
      .orderBy("l_returnflag")

  /** A-pivot — groupBy().pivot(): wide conditional aggregation. */
  def aPivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum("l_quantity"), 4))
      .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o"))
      .orderBy("l_returnflag")

  /** U3 — intersect/except (beyond the reference; SURVEY §2.7 note). */
  def u3IntersectExcept(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val early = o.filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
      .select("o_custkey").distinct()
    val late = o.filter(col("o_orderdate") >= ts("1998-01-01 00:00:00"))
      .select("o_custkey").distinct()
    early.intersect(late).withColumn("set_op", lit("both"))
      .unionByName(early.except(late).withColumn("set_op", lit("early_only")))
      .orderBy("set_op", "o_custkey")
  }

  /** W4 — lead + ntile window functions (frame coverage beyond W1–W3). */
  def w4LeadNtile(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(s, d)
      .filter(col("o_custkey") <= 50)
      .select(
        col("o_custkey"), col("o_orderkey"),
        lead("o_orderkey", 1).over(w).as("next_orderkey"),
        ntile(4).over(w).as("quartile"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** S9 — JSON sink + scan round-trip (aggregate parity vs the parquet
    * oracle, same pattern as the CSV round-trip). */
  def s9JsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val src = Tables.nation(s, d)
    val tmp = sys.props("java.io.tmpdir") +
      s"/graft_${ProcessHandle.current.pid}/json_roundtrip/nation"
    src.write.mode("overwrite").json(tmp)
    s.read.schema(src.schema).json(tmp)
      .groupBy("n_regionkey").agg(count(lit(1)).as("n"))
      .orderBy("n_regionkey")
  }

  /** Q3-shaped flagship: shipping-priority revenue — 3-way join with
    * filters on all three tables, grouped revenue, top-10. The scan-side
    * filters (mktsegment, both date bounds) push down; customer is the
    * small probe side and broadcasts; only lineitem⋈orders shuffles. */
  def q3Shipping(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < ts("1995-03-15 00:00:00"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > ts("1995-03-15 00:00:00"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)

  /** Q5-shaped flagship: local-supplier volume — 6-way join (two fact
    * tables + four dims), region filter walked down the dim chain,
    * per-nation revenue. Dims broadcast; the c_nationkey = s_nationkey
    * condition rides the supplier join. */
  def q5LocalSupplier(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1997-01-01 00:00:00"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))

  /** U-upsert — snapshot merge (SCD-1): a base snapshot plus an update
    * batch, keep the newest version per key — the reference's
    * weekly-store maintenance generalized to true upserts. One window
    * over (key, version desc); at scale this is one shuffle on the key,
    * the same plan a MERGE INTO executes for latest-wins. */
  def uUpsert(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val base = o.select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"), lit(1).as("version"))
    // deterministic update batch: every 7th order re-lands 10% pricier.
    // The ×1.1 runs in exact decimal: round(double*1.1, 2) straddles
    // half-way points differently across engines (the binary double for
    // x.xx5 sits just below the decimal midpoint), so cast to
    // DECIMAL(15,2) first — decimal×decimal is exact and HALF_UP then
    // agrees everywhere — and cast back to double for the union.
    val updates = o.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        round(col("o_totalprice").cast("decimal(15,2)") *
            lit(new java.math.BigDecimal("1.1")), 2)
          .cast("double").as("o_totalprice"),
        lit(2).as("version"))
    val w = Window.partitionBy("o_orderkey")
      .orderBy(desc("version"))
    base.unionByName(updates)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  /** S-merge-schema — schema-evolution read: two parquet batches with
    * different (compatible) schemas read back as one table via
    * mergeSchema, missing columns null-filled — the drift story the
    * reference meets with inferSchema + serve-time zero-fill. */
  def sMergeSchema(s: SparkSession, d: String): DataFrame = {
    val tmp = sys.props("java.io.tmpdir") +
      s"/graft_${ProcessHandle.current.pid}/merge_schema"
    val n = Tables.nation(s, d)
    n.select("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$tmp/batch1")
    n.select("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$tmp/batch2")
    s.read.option("mergeSchema", "true").parquet(s"$tmp/batch1", s"$tmp/batch2")
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n"), count(col("n_regionkey")).as("n_with_region"))
      .orderBy(asc_nulls_first("n_regionkey"))
  }

  /** W5 — remaining rank family: dense_rank, percent_rank, cume_dist
    * over one window (completes W1–W4's row_number/lead/ntile/frames). */
  def w5RankFamily(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(s, d)
      .filter(col("c_custkey") <= 200)
      .select(col("c_custkey"), col("c_mktsegment"),
        dense_rank().over(w).as("drank"),
        round(percent_rank().over(w), 6).as("prank"),
        round(cume_dist().over(w), 6).as("cdist"))
      .orderBy("c_custkey")
  }

  /** A-unpivot — melt wide → long (the inverse of `a_pivot`): a
    * per-flag metrics row fans out to one (metric, value) row per
    * measure. Spark's native `unpivot` is a zero-shuffle generate over
    * the (already tiny, post-aggregate) wide frame — the shape every
    * metrics store / plotting layer wants long-form data in. */
  def aUnpivot(s: SparkSession, d: String): DataFrame = {
    val wide = Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_price"),
        round(avg("l_discount"), 6).as("avg_disc"))
    wide.unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
        "metric", "value")
      .orderBy("l_returnflag", "metric")
  }

  /** A-rollup — hierarchical grouping-sets twin of `a_cube`. */
  def aRollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** DQ — data-quality gate over the corpus: key uniqueness, not-null,
    * referential integrity, and a value-range check, one aggregation
    * pass each (graft.ops.Quality; the reference ships the dependency
    * for this and never uses it — SURVEY §5). */
  def dqChecks(s: SparkSession, d: String): DataFrame = {
    import graft.ops.Quality
    val orders = Tables.orders(s, d)
    val customer = Tables.customer(s, d)
    val lineitem = Tables.lineitem(s, d)
    Quality.report(Seq(
      Quality.uniqueCheck(orders, Seq("o_orderkey"), "orders_pk_unique"),
      Quality.uniqueCheck(customer, Seq("c_custkey"), "customer_pk_unique"),
      Quality.uniqueCheck(lineitem, Seq("l_orderkey", "l_linenumber"),
        "lineitem_pk_unique"),
      Quality.notNullCheck(orders, "o_custkey", "orders_custkey_not_null"),
      Quality.fkCheck(orders, "o_custkey", customer, "c_custkey",
        "orders_customer_fk"),
      Quality.fkCheck(lineitem, "l_orderkey", orders, "o_orderkey",
        "lineitem_orders_fk"),
      Quality.rangeCheck(lineitem, "l_discount", 0.0, 0.1,
        "lineitem_discount_range")))
  }

  /** U-SCD2 — history construction over three deterministic snapshot
    * versions of orders: v2 reprices every 7th order (u_upsert's
    * batch), v3 re-lands every 14th — UNCHANGED for most (suppressed:
    * the v2 interval must extend, not fragment), but flipped to status
    * 'X' for every 28th (a real change: v2 closes at valid_to = 3).
    * Output is the per-(version, status, currency) census of the
    * resulting history. */
  def uScd2(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val priced = round(col("o_totalprice").cast("decimal(15,2)") *
        lit(new java.math.BigDecimal("1.1")), 2)
      .cast("double")
    val base = o.select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"), lit(1).as("version"))
    val v2 = o.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        priced.as("o_totalprice"), lit(2).as("version"))
    val v3 = o.filter(col("o_orderkey") % 14 === 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 28 === 0, "X").otherwise("U")
          .as("o_orderstatus"),
        priced.as("o_totalprice"), lit(3).as("version"))
    graft.ops.Scd.scd2History(
        base.unionByName(v2).unionByName(v3),
        keyCols = Seq("o_orderkey"), versionCol = "version",
        trackCols = Seq("o_orderstatus", "o_totalprice"))
      .groupBy("version", "o_orderstatus", "is_current")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("sum_price"))
      .orderBy("version", "o_orderstatus", "is_current")
  }

  /** DQ — key-skew diagnostic over lineitem's supplier key: the
    * measurement that decides whether a join on this key needs salting
    * (graft.ops.Skew.skewStats). One row of exact distribution stats. */
  def dqSkewStats(s: SparkSession, d: String): DataFrame =
    graft.ops.Skew.skewStats(Tables.lineitem(s, d), "l_suppkey", topK = 10)

  /** A-map — metrics-store map columns (the reference stores per-grade
    * F1 and the prediction distribution as Postgres JSONB,
    * model_inference_utils.py:114–115; SURVEY §1.1 maps JSONB to
    * MapType): per-status aggregates packed into two map columns,
    * appended through ParquetMetricsStore, read back, and queried
    * per-key via element_at — the reference's "F1 for grade X last
    * week" access path. */
  def aMapMetrics(s: SparkSession, d: String): DataFrame = {
    val tmp = sys.props("java.io.tmpdir") +
      s"/graft_${ProcessHandle.current.pid}/map_metrics/store"
    // the store APPENDS (one row per weekly eval); start from a fresh
    // path so re-runs in one process don't accumulate rows
    val p = new org.apache.hadoop.fs.Path(tmp)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val per = Tables.orders(s, d).groupBy(col("o_orderstatus").as("g"))
      .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 4).as("v"))
    val row = per.agg(
      map_from_entries(sort_array(collect_list(struct(col("g"), col("v")))))
        .as("f1_by_grade"),
      map_from_entries(sort_array(collect_list(struct(col("g"), col("n")))))
        .as("predictions_distribution"))
      .select(lit("2024-01-07").as("week_date"), lit("lgbm").as("model_name"),
        col("f1_by_grade"), col("predictions_distribution"))
    val store = new graft.sources.ParquetMetricsStore(tmp)
    store.append(row)
    store.read(s).select(
      col("week_date"), col("model_name"),
      element_at(col("f1_by_grade"), "F").as("avg_f"),
      element_at(col("f1_by_grade"), "O").as("avg_o"),
      element_at(col("f1_by_grade"), "P").as("avg_p"),
      element_at(col("predictions_distribution"), "F").as("n_f"),
      element_at(col("predictions_distribution"), "O").as("n_o"),
      element_at(col("predictions_distribution"), "P").as("n_p"),
      size(col("f1_by_grade")).as("n_grades"))
      .orderBy("week_date")
  }

  /** F1–F8 — scalar function battery: CASE WHEN, date trunc/extract,
    * months_between, trim/upper/coalesce, regexp_extract (SURVEY §2.3). */
  def fScalarFns(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") <= 500)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("price_band"),
        date_format(trunc(col("o_orderdate"), "MM"), "yyyy-MM-dd").as("order_month"),
        round(months_between(ts("2002-01-01 00:00:00"), col("o_orderdate")), 6).as("months_ago"),
        upper(trim(col("o_orderpriority"))).as("prio_norm"),
        coalesce(col("o_orderstatus"), lit("MISSING")).as("status_filled"),
        regexp_extract(col("o_orderpriority"), "^(\\d+)", 1).cast("int").as("prio_rank"))
      .orderBy("o_orderkey")

  /** J7 — skew-salted equi-join: lineitem⋈orders on the order key
    * through Skew.saltedJoin (salt factor 8). Salting is pure shuffle
    * topology — the big side's rows spread over 8 sub-keys per join
    * key, the small side replicates across them — so the result is
    * row-identical to the plain join, which is exactly what the oracle
    * recomputes. The mitigation for the single-hot-key stragglers AQE's
    * skew split can't break up. */
  def j7SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.ops.Skew.saltedJoin(l, o, Seq("l_orderkey"), saltFactor = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  /** A-grouping-sets — a custom aggregation lattice: (status, priority)
    * detail, per-status subtotal, and grand total in ONE pass — the
    * lattice cube/rollup can't express when only selected combinations
    * are wanted (cube would add the per-priority slice nobody asked
    * for, paying its aggregation). Through the SQL interface: GROUPING
    * SETS has no stable DataFrame-API counterpart. */
  def aGroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 4) AS sum_price
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        |""".stripMargin)
  }

  /** W6 — RANGE-frame window: per-customer trailing-30-day order total.
    * Unlike the w3 ROWS frame (which counts physical rows), a RANGE
    * frame bounds by VALUE distance on the ordering key — same-second
    * ties all enter the frame together, and gaps in time shrink it.
    * Ordered on epoch seconds so the frame bound is plain integer
    * arithmetic both engines share. */
  def w6RangeFrame(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).filter(col("o_custkey") <= 200)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("es"), col("o_totalprice"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("es")
      .rangeBetween(-30L * 86400, 0)
    o.select(col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 4).as("trailing_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** DQ-profile — ONE-pass column profiling: per-column null count,
    * distinct count, and min/max, melted to one row per column — the
    * ingest-time profile a data-quality gate reads before rules exist.
    * One aggregation job over the table. Distinct counting is
    * approx_count_distinct (HLL++, rsd 2%) BY DEFAULT: exact
    * countDistinct makes Spark expand the input once per distinct
    * column, so a 4-column profile scans the table ~4× through the
    * exchange — at 100 TB the profile would cost more than the queries
    * it guards. A profile tolerates ±2% on distinct counts by nature
    * (it feeds alerts, not answers); `exact = true` keeps the exact
    * variant for small tables and for the DuckDB oracle gate (spec pins
    * approx within 5% of exact). min/max are cast AFTER aggregation so
    * numeric columns order numerically, not lexicographically. */
  def dqProfile(s: SparkSession, d: String, exact: Boolean = false): DataFrame = {
    val docs = Tables.documents(s, d)
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    val aggs = cols.flatMap { c => Seq(
      count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
      (if (exact) countDistinct(col(c))
       else approx_count_distinct(col(c), 0.02)).as(s"${c}__distinct"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max")) }
    val one = docs.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c => struct(lit(c).as("col_name"),
      col(s"${c}__nulls").as("n_null"),
      col(s"${c}__distinct").as("n_distinct"),
      col(s"${c}__min").as("min_val"),
      col(s"${c}__max").as("max_val")) }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
      .orderBy("col_name")
  }

  /** A12 — approximate quantiles under their RANK-ERROR contract:
    * `percentile_approx(acc)` (Spark's Greenwald–Khanna variant)
    * guarantees the returned value's rank lies within ±n/acc of the
    * target rank — the one-pass, mergeable, bounded-state answer to
    * "what's the p50/p99" over 10¹² rows, where an exact percentile
    * needs a sort or a full value histogram. The gate checks the
    * CONTRACT, not the value (the value is sketch-internal): for each
    * q, count(v ≤ approx) must reach ⌊(q − ε)·n⌋ and count(v < approx)
    * must not pass ⌈(q + ε)·n⌉ — the ≤/< pair makes the check
    * tie-robust. The oracle pins every flag 1 (plus n_rows, so the
    * gate is data-dependent): a sketch whose error exceeds its bound
    * flips a flag → hash mismatch. Two passes: sketch+count, then one
    * flag aggregation against the 1-row broadcast. */
  def a12ApproxQuantiles(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_totalprice").as("v"))
    val qs = Seq(0.25, 0.5, 0.75)
    val acc = 10000
    val eps = 1.0 / acc
    val one = o.agg(
      percentile_approx(col("v"), array(qs.map(lit): _*), lit(acc)).as("_aq"),
      count(lit(1)).as("_n"))
    val aggs = qs.indices.flatMap { i =>
      Seq(sum(when(col("v") <= col("_aq").getItem(i), 1L).otherwise(0L))
          .as(s"_le$i"),
        sum(when(col("v") < col("_aq").getItem(i), 1L).otherwise(0L))
          .as(s"_lt$i"))
    } :+ first(col("_n")).as("_n")
    val counted = o.crossJoin(broadcast(one))
      .agg(aggs.head, aggs.tail: _*)
    val rows = qs.zipWithIndex.map { case (q, i) =>
      struct(lit(q).as("q"), col("_n").as("n_rows"),
        when(col(s"_le$i") >= floor((lit(q) - eps) * col("_n")) &&
          col(s"_lt$i") <= ceil((lit(q) + eps) * col("_n")), 1)
          .otherwise(0).as("rank_ok"))
    }
    counted.select(explode(array(rows: _*)).as("p")).select("p.*")
      .orderBy("q")
  }

  /** J8 — full outer join: customers (slice ≤ 1000) against per-customer
    * order counts; rows classify as both / customer_only / order_only —
    * the reconciliation shape (which side is missing what). Same
    * shuffled equi-join as inner; FULL OUTER only changes null
    * preservation, not the exchange plan. */
  def j8FullOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_custkey"))
      .filter(col("c_custkey") <= 1000)
    val o = Tables.orders(s, d).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .select(
        when(col("c_custkey").isNull, "order_only")
          .when(col("o_custkey").isNull, "customer_only")
          .otherwise("both").as("side"))
      .groupBy("side").agg(count(lit(1)).as("n"))
      .orderBy("side")
  }

  /** A10 — approximate distinct count (HyperLogLog++): the map-side-
    * combinable sketch that replaces exact countDistinct's
    * expand-then-shuffle at 100 TB (a distinct over 10¹¹ keys shuffles
    * the key set; the HLL sketch is a few KB per group regardless).
    * Oracle-gated like r1: DuckDB recomputes the exact count and the
    * query pins the approx estimate to within ±5% of it (rsd = 2%, so a
    * healthy sketch clears 5% with overwhelming margin; a broken one
    * flips the flag → hash mismatch). The raw estimate is
    * engine-specific (HLL register layout), hence gated, not
    * value-compared.
    *
    * The exact and approx aggregates run as SEPARATE aggregations
    * joined on the (3-row) group key: combined in one `agg`, Spark
    * rewrites countDistinct+other as a first aggregate keyed by
    * (group, distinct value) that carries the other function's partial
    * buffer per group — and the rsd=2% HLL buffer is ~412 longs, so
    * ~450 k (returnflag, orderkey) groups dragged ~1.5 GB through the
    * first exchange (measured 3.4 s; split: two clean pruned scans,
    * each exchange carrying only its own partials). */
  def a10ApproxDistinct(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).select("l_returnflag", "l_orderkey")
    val exact = l.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n_exact"))
    val approx = l.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("_approx"))
    exact.join(approx, "l_returnflag")
      .select(col("l_returnflag"), col("n_exact"),
        when(abs(col("_approx") - col("n_exact")) <=
          col("n_exact") * lit(0.05), 1).otherwise(0).as("approx_ok"))
      .orderBy("l_returnflag")
  }

  /** Heavy hitters over a column: items occurring in more than
    * `support` fraction of rows, with the exact count AND whether the
    * one-pass sketch surfaced them. `freqItems` is Spark's Karp/
    * Misra–Gries-family counter map — per-partition state bounded by
    * 1/support entries, merged on the driver, NO shuffle of the value
    * set — which is how "what are the hot n-grams/URLs/licenses" is
    * answered over 10¹² rows (an exact groupBy shuffles every distinct
    * value; the sketch ships ≤ 1/support counters per partition). The
    * sketch's contract is superset-only (no false negatives above
    * support, false positives possible), so the gate pins
    * `in_sketch = 1` on every EXACT hot item: a sketch that drops a
    * true heavy hitter flips the flag → hash mismatch, while the
    * sketch's extra candidates are simply not rows here. */
  def heavyHitters(values: DataFrame, c: String, support: Double): DataFrame = {
    // TWO passes over the raw values, not three: the exact count table
    // is snapshotted once (localCheckpoint — bounded by the vocabulary,
    // which the groupBy shuffles anyway) and serves both the total (a
    // 1-row reduction of it) and the hot-list filter; the sketch pass
    // over the raw stream is inherent. values.count() as a third full
    // scan was pure waste — the total is already in the counts.
    val counts = values.groupBy(c).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val totalRow = counts.agg(sum(col("n"))).first()
    if (totalRow.isNullAt(0)) return counts.withColumn("in_sketch", lit(1))
    val total = totalRow.getLong(0)
    val sketch = values.stat.freqItems(Array(c), support)
      .first().getSeq[Any](0)
    counts.filter(col("n") > lit(support * total))
      .withColumn("in_sketch",
        when(col(c).isin(sketch: _*), 1).otherwise(0))
  }

  /** A11 — hot tokens of the document corpus (support 1%): the exact
    * hot list (oracle-recomputable) flagged with the sketch's verdict.
    * Support chosen with ≥ 245-count margin to the nearest token count
    * at every test SF, so the strict-`>` threshold can never straddle
    * an engine-rounding boundary. */
  def a11HeavyHitters(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
    heavyHitters(toks, "tok", 0.01)
      .orderBy("tok")
  }
}
