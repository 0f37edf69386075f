package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks the latest right row at-or-before each left row, per key") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05"), 100.0),
      (2L, "A", ts("2024-01-01 10:00:10"), 101.0),
      (3L, "B", ts("2024-01-01 10:00:01"), 200.0), // before any B quote
      (4L, "B", ts("2024-01-01 10:00:20"), 201.0))
      .toDF("trade_id", "sym", "ts", "price")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 99.0),
      ("A", ts("2024-01-01 10:00:10"), 99.5), // ties with trade 2 -> matches (>=)
      ("B", ts("2024-01-01 10:00:02"), 199.0))
      .toDF("sym", "ts", "quote")
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", Seq("quote"))
      .select("trade_id", "asof_quote")
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(99.0))
    assert(out(2L).contains(99.5), "equal-ts right row matches (inclusive)")
    assert(out(3L).isEmpty, "no quote at-or-before -> null (left outer)")
    assert(out(4L).contains(199.0))
    assert(out.size == 4)
  }

  test("asOf matches the naive max-per-left theta join on random data") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(13)
    val left = (0 until 300).map { i =>
      (i.toLong, s"k${rnd.nextInt(5)}",
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L))
    }.toDF("lid", "k", "ts")
    // unique right (k, ts) pairs so the match is well-defined
    val right = new scala.util.Random(7)
      .shuffle((0 until 200).toList).take(150).map { j =>
        (s"k${j % 5}", new Timestamp(1700000000000L + (j / 5) * 2500L * 1000L),
          j.toDouble)
      }.toDF("k", "ts", "v")
    val fast = AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("v"))
      .select("lid", "asof_v").as[(Long, Option[Double])].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lid").orderBy($"r.ts".desc_nulls_last)
    val naive = left.as("l")
      .join(right.as("r"), $"l.k" === $"r.k" && $"l.ts" >= $"r.ts", "left")
      .withColumn("_rn", row_number().over(w))
      .filter($"_rn" === 1)
      .select($"lid", $"r.v".as("v"))
      .as[(Long, Option[Double])].collect().toMap
    assert(fast == naive)
  }

  test("asOf honors null payload fields in the matched row (no stale carry-forward)") {
    val left = Seq((1L, "A", ts("2024-01-01 10:00:06"))).toDF("lid", "k", "ts")
    val right = Seq(
      ("A", ts("2024-01-01 10:00:00"), Option(5.0), Option("old")),
      ("A", ts("2024-01-01 10:00:05"), Option.empty[Double], Option("new")))
      .toDF("k", "ts", "v", "tag")
    val r = AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("v", "tag"))
      .select("asof_v", "asof_tag")
      .as[(Option[Double], Option[String])].head()
    // the 10:00:05 row is the match: its null v must come through as
    // null, NOT the 10:00:00 row's 5.0 — and v/tag must not be stitched
    // from different right rows
    assert(r == (None, Some("new")))
  }

  test("asOf preserves every left column and row") {
    val left = Seq((1L, "A", ts("2024-01-01 00:00:01"), "keep-me"))
      .toDF("id", "k", "ts", "note")
    val right = Seq(("A", ts("2024-01-01 00:00:00"), 7.0)).toDF("k", "ts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("v"))
    assert(out.columns.toSeq == Seq("id", "k", "ts", "note", "asof_v"))
    assert(out.select("note").as[String].head() == "keep-me")
  }
}
