package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling / splitting operators (SURVEY §2.9 R1–R2).
  *
  * The engine's preferred split is HASH-based, not RNG-based: membership
  * is a pure function of the row key, so it is reproducible across runs,
  * partitionings, and cluster sizes — the property sklearn's
  * random_state split only gives you on one machine with one ordering.
  * Seeded `sample`/`sampleBy` are kept for reference parity.
  */
object Sampling {

  /** R1 — Bernoulli sample (model_operations.py:79–85). */
  def bernoulli(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(fraction, seed)

  /** R2 — stratified sample: per-class fractions (sampleBy). */
  def stratified(df: DataFrame, labelCol: String,
                 fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(labelCol, fractions, seed)

  /** Deterministic hash membership: true ⇔ row lands in [0, pct) of 100
    * buckets derived from xxhash64(key, salt). */
  def hashBucket(key: Column, salt: String): Column =
    pmod(xxhash64(key, lit(salt)), lit(100))

  /** R2 (engine-native) — reproducible stratified-ish train/test split:
    * same key always lands on the same side, no RNG, no collect.
    * Returns (train, test). */
  def hashSplit(df: DataFrame, keyCol: String, testPct: Int,
                salt: String = "split"): (DataFrame, DataFrame) = {
    val b = hashBucket(col(keyCol), salt)
    (df.filter(b >= testPct), df.filter(b < testPct))
  }

  /** Per-group quota sample: keep `quota` rows per group, selected by a
    * deterministic pseudo-random rank — md5 of the key's string form, so
    * the selection is reproducible across runs, partitionings, AND
    * engines (md5 is cross-engine comparable where xxhash64 is not; the
    * key tiebreak covers md5 collisions). The standard corpus-balancing
    * step: cap each language/source/domain at a fixed share. One shuffle
    * on the group column; rank + filter is window-local. */
  def quotaSample(df: DataFrame, groupCol: String, keyCol: String,
                  quota: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(md5(col(keyCol).cast("string").cast("binary")), col(keyCol))
    df.withColumn("_qrk", row_number().over(w))
      .filter(col("_qrk") <= quota)
      .drop("_qrk")
  }
}
