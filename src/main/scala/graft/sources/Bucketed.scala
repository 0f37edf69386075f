package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables: co-located joins without a shuffle.
  *
  * Writing both join sides bucketed (and sorted) by the join key lets
  * Catalyst plan a sort-merge join with NO Exchange on either side —
  * at 100 TB this turns the nightly fact⋈fact join from a full-cluster
  * shuffle into local merges. The bucket count fixes parallelism for
  * the join stage; pick it from target partition size, not cluster size.
  */
object Bucketed {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
