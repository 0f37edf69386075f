package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet corpus (TESTDATA.md).
  *
  * Scale-design note: each table is a plain parquet directory scan, so
  * Catalyst's parquet source gives us vectorized reads, predicate
  * pushdown, and column pruning for free. At 100 TB the same call reads
  * a partitioned table; nothing here assumes single-file layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet's `ts` has shipped as TIMESTAMP(NANOS) in some data
    * generations (Spark 4 rejects it by default — read nanos as long,
    * rebuild with integer division: ns-epoch exceeds double's 2^53
    * mantissa, so float division would corrupt timestamps) and as plain
    * TIMESTAMP(MICROS) in others (arrives as TIMESTAMP_NTZ — cast to
    * the session-zoned type so downstream window/diff arithmetic sees
    * ONE type either way; the session is pinned UTC, so the cast is
    * instant-preserving). Route by the loaded type, not by assumption. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(s, d, "events"))
  }

  /** The ts-routing half of [[events]], shared with the STREAMING twin
    * (EventStreamSpec reads the same file through readStream, where the
    * schema is declared up front but the loaded frame still reports its
    * ts type) — one routing rule, so the batch and stream sides can
    * never silently disagree on what `ts` means. Works on batch and
    * streaming frames alike. */
  def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  /** Adaptive map-parallelism widen (optimization guide §2.5 "input
    * skew: one huge unsplittable file ... repartition immediately after
    * the read") for operators whose PER-ROW map work is heavy
    * (tokenize → shingle → 64 MinHash transforms, md5 rank keys, …).
    * A parquet row group is the scan's atomic split, so a one-row-group
    * input (the driver's test tables; a gzip'd crawl shard in
    * production) executes the whole map pass in ONE task regardless of
    * core count — profiling round 18 showed single 4+ s tasks
    * serializing 32 idle cores. When the input has fewer partitions
    * than the session's parallelism, redistribute by a deterministic
    * hash of the id column (NOT round-robin: a stable row→partition
    * map keeps seeded draws reproducible at a given config); when the
    * input is already wide — every real deployment — this is a
    * provable no-op, so no cluster-scale query pays the exchange.
    * Deliberately NOT applied at the table loaders: operators that
    * never ship the payload (exactDedup's project-before-shuffle
    * contract) and cheap projections must not inherit a text exchange.
    * Rank/rank-order outputs are partitioning-independent (total ORDER
    * BY + rounded aggregates — the board's construction invariant). */
  def widenIfNarrow(df: DataFrame, key: String): DataFrame =
    widenIfNarrowBy(df, col(key))

  /** [[widenIfNarrow]] keyed on an arbitrary deterministic expression —
    * for frames with no id column (hash the payload column instead:
    * still a stable row→partition map, still a no-op on wide input).
    *
    * The partition-count probe (`df.rdd`) is only cheap on MAP-SHAPED
    * plans (projections/filters over a leaf): under AQE it eagerly
    * materializes any shuffle/broadcast stages of the input just to
    * read a number, running the upstream twice (measured: 2 discarded
    * jobs on a join-bearing frame, 0 on a scan). Inputs that already
    * contain an exchange-producing operator are left alone — their
    * post-shuffle partitioning is AQE-governed and never the one-split
    * scan this helper exists to fix. */
  def widenIfNarrowBy(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def mapShaped(p: LogicalPlan): Boolean = p match {
      case _: LeafNode => true
      case p: Project => mapShaped(p.child)
      case f: Filter => mapShaped(f.child)
      case s: SubqueryAlias => mapShaped(s.child)
      case _ => false
    }
    if (!mapShaped(df.queryExecution.analyzed)) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < p) df.repartition(p, key) else df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
