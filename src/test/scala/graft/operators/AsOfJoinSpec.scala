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

  test("asOf preserves every left column and row") {
    val left = Seq((1L, "A", ts("2024-01-01 00:00:01"), "keep-me"))
      .toDF("id", "k", "ts", "note")
    val right = Seq(("A", ts("2024-01-01 00:00:00"), 7.0)).toDF("k", "ts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("v"))
    assert(out.columns.toSeq == Seq("id", "k", "ts", "note", "asof_v"))
    assert(out.select("note").as[String].head() == "keep-me")
  }
}
