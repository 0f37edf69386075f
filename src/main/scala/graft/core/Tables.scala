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
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
