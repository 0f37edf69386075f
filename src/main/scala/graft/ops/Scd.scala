package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history construction.
  *
  * `u_upsert` (SCD-1, latest-wins) keeps only the current truth; SCD-2
  * keeps the full history as validity intervals — the snapshot layout a
  * training pipeline needs to answer "what did this row look like when
  * the model trained" (point-in-time correctness; the reference's weekly
  * snapshot ingest is exactly this shape — process_bronze_tables.py /
  * process_silver_tables.py land dt-keyed weekly snapshots whose
  * history this operator would compact).
  */
object Scd {

  /** Build SCD-2 history from versioned snapshot rows: one row per
    * CHANGE POINT per key, with `valid_from` = its version,
    * `valid_to` = the next change's version (null while current) and an
    * `is_current` flag. Consecutive versions whose `trackCols` are
    * unchanged are SUPPRESSED — a re-landed identical snapshot extends
    * the existing interval instead of fragmenting history (the standard
    * SCD-2 rule).
    *
    * Scale shape: both windows partition by the SAME key columns, so
    * the plan pays ONE hash exchange by key and reuses its sort; the
    * change filter runs between them map-side. No driver state, no
    * collect — at 100 TB the history build is exactly one shuffle of
    * the snapshot union. Contract: (key, version) unique — enforce
    * upstream (e.g. version = snapshot date). */
  def scd2History(df: DataFrame, keyCols: Seq[String], versionCol: String,
                  trackCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && trackCols.nonEmpty)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol))
    val track = struct(trackCols.map(col): _*)
    // <=> (null-safe equality): a nullable tracked attribute must not
    // make every comparison a change
    val changes = df
      .withColumn("_prev", lag(track, 1).over(w))
      .filter(col("_prev").isNull || !(col("_prev") <=> track))
      .drop("_prev")
    changes
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
  }
}
