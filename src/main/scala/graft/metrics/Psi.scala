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

  /** Per-bucket proportions of `c` in `df` under the given breaks —
    * always emits all buckets (missing ones as 0). */
  private def proportions(df: DataFrame, c: String, breaks: Array[Double]): DataFrame = {
    // total comes from a window-sum over the (<= breaks+1 row) bucket
    // counts — no second scan of the raw data for a count()
    val counted = df
      .groupBy(bucketOf(col(c), breaks).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val allBuckets = df.sparkSession.range(breaks.length + 1)
      .select(col("id").cast("int").as("bucket"))
    allBuckets.join(counted, Seq("bucket"), "left")
      .select(col("bucket"),
        (coalesce(col("cnt"), lit(0L)) / max("total").over(
          org.apache.spark.sql.expressions.Window.partitionBy())).as("prop"))
  }

  /** PSI of `actual` vs `expected` on column `c`, decile buckets. */
  def psi(expected: DataFrame, actual: DataFrame, c: String): DataFrame = {
    val breaks = decileBreaks(expected, c)
    val e = proportions(expected, c, breaks).withColumnRenamed("prop", "e_prop")
    val a = proportions(actual, c, breaks).withColumnRenamed("prop", "a_prop")
    val clamp = (x: Column) => when(x === 0.0, 1e-4).otherwise(x)
    e.join(a, Seq("bucket"))
      .select(
        ((clamp(col("a_prop")) - clamp(col("e_prop"))) *
          log(clamp(col("a_prop")) / clamp(col("e_prop")))).as("term"))
      .agg(round(sum("term"), 6).as("psi"))
  }
}
