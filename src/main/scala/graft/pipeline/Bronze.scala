package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Bronze ingest (process_bronze_tables.py semantics): CSV scan with an
  * explicit schema + weekly event-date window filter + raw landing write.
  *
  * The reference streams pandas chunks of 5,000 rows to bound memory
  * (process_bronze_tables.py:47); under Spark, bounded memory is inherent
  * to partitioned execution, and the week predicate is pushed into the
  * scan. One write per week becomes ONE partitioned write for all weeks
  * (replacing the reference's per-date loop, silver_processing.py:51–58).
  */
object Bronze {

  /** Scan a source CSV with declared schema (no inferSchema — SURVEY §1.3). */
  def scanCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Weekly window filter: snapshot_date ∈ [weekStart, weekStart+6d]. */
  def weekFilter(df: DataFrame, weekStart: String): DataFrame =
    df.filter(col("snapshot_date").between(
      to_date(lit(weekStart)),
      date_add(to_date(lit(weekStart)), 6)))

  /** Land all weeks at once, partitioned by week start — replaces the
    * reference's O(weeks) per-date write loop with one job whose output
    * is partition-pruned on read. */
  def landPartitioned(df: DataFrame, outDir: String): Unit =
    df.withColumn("week_start",
        date_format(date_sub(col("snapshot_date"),
          (dayofweek(col("snapshot_date")) + 6) % 7), "yyyy-MM-dd"))
      .write.mode("overwrite")
      .partitionBy("week_start")
      .parquet(outDir)
}
