package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — the second classic operator Spark
  * lacks natively (a raw `p >= start AND p < end` condition plans as a
  * BroadcastNestedLoop or a per-key cross product).
  *
  * Physical strategy: BUCKETIZE. Each interval is exploded into the
  * fixed-width buckets it overlaps; each point belongs to exactly one
  * bucket; the join is then an EQUI-join on the bucket id with the exact
  * containment predicate as a post-filter. A (point, interval) match is
  * found in exactly one bucket — the point's — so no dedup is needed.
  * Cost: one uniform hash shuffle on the bucket id; interval replication
  * = ceil(length / bucketWidth), so pick the width near the median
  * interval length (replication stays O(1) per interval while buckets
  * stay selective).
  */
object RangeJoin {

  /** Inner point-in-interval join: rows of `points` paired with every
    * row of `intervals` whose [startCol, endCol) contains ptCol. All
    * three columns must be LongType on the same scale (e.g. epoch
    * micros). Empty intervals (end <= start) match nothing. */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val ivB = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_bucket",
        explode(sequence(floor(col(startCol) / w).cast("long"),
          floor((col(endCol) - 1) / w).cast("long"))))
    val ptB = points.withColumn("_bucket", floor(col(ptCol) / w).cast("long"))
    ptB.join(ivB, "_bucket")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_bucket")
  }
}
