package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Population Stability Index (SURVEY §2.4 A9 / §2.10 M8;
  * model_operations.py:161–179).
  *
  * PSI = Σ (actual% − expected%) · ln(actual% / expected%) over the
  * expected distribution's decile buckets. Zero proportions are clamped
  * to 1e−4 exactly like the reference's numpy implementation.
  *
  * Scale shape: decile breakpoints are ONE exact-percentile aggregate on
  * the expected side (9 doubles to the driver — O(1) regardless of data
  * size), then both sides take a single map-side-combinable bucket-count
  * aggregation. No shuffle larger than 10 groups.
  */
object Psi {

  /** Decile breakpoints (p10..p90) of `c` on `expected`. */
  def decileBreaks(expected: DataFrame, c: String): Array[Double] = {
    val ps = (1 to 9).map(_ / 10.0)
    val row = expected
      .agg(expr(s"percentile(`$c`, array(${ps.mkString(",")}))").as("b"))
      .first()
    row.getSeq[Double](0).toArray
  }

  /** Bucket index 0..breaks.length for value `c` given ascending breaks:
    * bucket i ⇔ value ≤ breaks(i), last bucket ⇔ value > last break. */
  def bucketOf(c: Column, breaks: Array[Double]): Column =
    breaks.zipWithIndex.foldRight(lit(breaks.length)) {
      case ((b, i), rest) => when(c <= b, i).otherwise(rest)
    }

  /** PSI of `actual` vs `expected` on column `c`, decile buckets.
    *
    * After the O(1)-output breakpoint aggregate, BOTH sides bucket-count
    * in one pass: a tagged union feeds a single aggregation with
    * conditional sums per side (map-side combinable, ≤ 10 groups), so
    * the plan has one scan per input and one tiny shuffle — no
    * per-side count jobs and no bucket join of two aggregates. */
  def psi(expected: DataFrame, actual: DataFrame, c: String): DataFrame = {
    val breaks = decileBreaks(expected, c)
    val tagged = expected.select(lit("e").as("_side"), col(c))
      .unionByName(actual.select(lit("a").as("_side"), col(c)))
    val counted = tagged
      .groupBy(bucketOf(col(c), breaks).as("bucket"))
      .agg(sum(when(col("_side") === "e", 1L).otherwise(0L)).as("e_cnt"),
        sum(when(col("_side") === "a", 1L).otherwise(0L)).as("a_cnt"))
    // missing buckets must still contribute (they clamp to 1e-4) —
    // outer-join the full bucket range back in
    val allBuckets = expected.sparkSession.range(breaks.length + 1)
      .select(col("id").cast("int").as("bucket"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val props = allBuckets.join(counted, Seq("bucket"), "left")
      .select(col("bucket"),
        (coalesce(col("e_cnt"), lit(0L)) /
          sum(coalesce(col("e_cnt"), lit(0L))).over(w)).as("e_prop"),
        (coalesce(col("a_cnt"), lit(0L)) /
          sum(coalesce(col("a_cnt"), lit(0L))).over(w)).as("a_prop"))
    val clamp = (x: Column) => when(x === 0.0, 1e-4).otherwise(x)
    props
      .select(
        ((clamp(col("a_prop")) - clamp(col("e_prop"))) *
          log(clamp(col("a_prop")) / clamp(col("e_prop")))).as("term"))
      .agg(round(sum("term"), 6).as("psi"))
  }
}
