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
      pmod(hash(big.columns.map(col): _*), lit(saltFactor)))
    val smallReplicated = small.withColumn(saltCol,
      explode(array((0 until saltFactor).map(lit): _*)))
    bigSalted.join(smallReplicated, keys :+ saltCol, joinType).drop(saltCol)
  }
}
