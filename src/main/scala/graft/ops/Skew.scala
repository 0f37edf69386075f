package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join.
  *
  * When one join key dominates (hot key), the shuffle partition holding
  * it becomes the straggler. Salting splits each hot key into
  * `saltFactor` sub-keys: the big side gets a random-but-deterministic
  * salt per row, the small side is replicated across every salt value,
  * and the join runs on (key, salt) — the hot key's rows spread over
  * `saltFactor` partitions. Result is row-identical to the plain join.
  *
  * AQE's skew-join handles moderate skew automatically; explicit salting
  * is for the pathological keys AQE can't split (single-key hot spots in
  * sort-merge joins). The salt is derived from stable row content
  * (hash of all big-side columns), not rand(), so replays and retries
  * stay deterministic.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // right/full outer would emit each unmatched small-side row once PER
    // SALT (replicated side preserved) — row-identity only holds for
    // big-side-preserving join types
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin does not preserve row identity for joinType=$joinType")
    val saltCol = "__salt"
    val bigSalted = big.withColumn(saltCol,
      pmod(hash(big.columns.toIndexedSeq.map(col): _*), lit(saltFactor)))
    val smallReplicated = small.withColumn(saltCol,
      explode(array((0 until saltFactor).map(lit): _*)))
    bigSalted.join(smallReplicated, keys :+ saltCol, joinType).drop(saltCol)
  }

  /** Key-skew diagnostic — the measurement that DECIDES whether a join
    * needs `saltedJoin` (or a bigger `saltFactor`), instead of guessing:
    * one row of distribution stats for a prospective join/groupBy key.
    *
    * `skew_ratio` (max key count / mean key count) is the straggler
    * multiplier a key-partitioned shuffle would see in the worst
    * partition; `top_share` is the row fraction held by the `topK`
    * hottest keys (how concentrated the problem is — one hot key salts
    * cheaply, a heavy-tailed thousand wants AQE). All integer/ratio
    * arithmetic — deterministic, no sketches.
    *
    * Scale shape: one map-side-combinable count per key, then a single
    * ~16-byte-row aggregate over key counts; the topK sum reuses the
    * counts table via a LIMIT-pushed sort (no driver collect). */
  def skewStats(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("_k"))
      .agg(count(lit(1)).as("_n"))
    val top = counts.orderBy(col("_n").desc, col("_k"))
      .limit(topK)
      .agg(sum("_n").as("top_n"))
    counts.agg(
        count(lit(1)).as("n_keys"),
        sum("_n").as("n_rows"),
        max("_n").as("max_n"),
        round(avg("_n"), 4).as("mean_n"),
        round(max("_n") / avg("_n"), 4).as("skew_ratio"))
      .crossJoin(top) // 1 row × 1 row
      .select(col("n_keys"), col("n_rows"), col("max_n"), col("mean_n"),
        col("skew_ratio"),
        round(col("top_n") / col("n_rows"), 6).as("top_share"))
  }
}
