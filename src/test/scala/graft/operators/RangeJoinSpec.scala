package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval matches the naive theta join, once per pair") {
    val points = (0L until 200L).map(p => (p, p * 7 % 500)).toDF("pid", "pt")
    // overlapping, irregular, and one empty interval
    val intervals = Seq(
      (1L, 0L, 100L), (2L, 50L, 60L), (3L, 90L, 400L),
      (4L, 250L, 250L), // empty: end == start
      (5L, 499L, 500L))
      .toDF("iid", "istart", "iend")
    val naive = points.join(intervals,
        $"pt" >= $"istart" && $"pt" < $"iend")
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    for (width <- Seq(1L, 7L, 64L, 1000L)) {
      val bucketed = RangeJoin.pointInInterval(
          points, "pt", intervals, "istart", "iend", width)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(bucketed == naive, s"width=$width diverged from the theta join")
    }
    assert(naive.nonEmpty && !naive.exists(_._2 == 4L))
  }
}
