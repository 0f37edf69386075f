package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for every left row, the latest right row with
  * right.ts <= left.ts (inclusive), per key — the trades⟵quotes shape
  * Spark has no native operator for.
  *
  * Physical strategy (SURVEY §2 custom-operator preference (a): compose
  * existing ops): tag the sides, union them, and run ONE window over
  * (key, ts) carrying the right payload forward with last(ignoreNulls).
  * Each left row then reads the payload of the latest right row at or
  * before it. Cost = one shuffle on the key + one sort — per-key linear.
  * The naive alternative, a join on `l.key = r.key AND r.ts <= l.ts`
  * plus a per-left-row max, explodes into a per-key cross product (or a
  * BroadcastNestedLoop when Catalyst can't equi-split the range) — this
  * formulation is the plan a 1000-executor cluster wants.
  *
  * Ties: a right row at exactly left.ts matches (>= semantics, like
  * DuckDB/pandas ASOF). The right side should be unique per (key, ts) —
  * among multiple right rows at the same instant the winner would follow
  * sort instability; pre-aggregate to one row per (key, ts) first.
  */
object AsOfJoin {

  /** Left keeps all its columns; the matched right row contributes
    * `payloadCols`, renamed with `prefix`. Unmatched left rows carry
    * null payloads (left-outer semantics).
    *
    * The right payload travels as ONE struct, not per-column: the struct
    * wrapper is non-null for every right row even when its fields are
    * null, so last(ignoreNulls) forward-fills the MATCHED ROW atomically
    * — a matched row with a null field yields that null (as DuckDB ASOF
    * does), and multiple payload columns can never be stitched together
    * from different right rows. */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String, payloadCols: Seq[String],
           prefix: String = "asof_"): DataFrame = {
    val lRow = struct(left.columns.toIndexedSeq.map(col): _*)
    val rPay = struct(payloadCols.map(col): _*)
    val lTagged = left.select(
      keyCols.map(col) ++
        Seq(col(tsCol).as("_ts"), lit(1).as("_side"), lRow.as("_lrow")) ++
        Seq(lit(null).cast(right.select(rPay).schema.head.dataType)
          .as("_rpay")): _*)
    val rTagged = right.select(
      keyCols.map(col) ++
        Seq(col(tsCol).as("_ts"), lit(0).as("_side"),
          lit(null).cast(lTagged.schema("_lrow").dataType).as("_lrow")) ++
        Seq(rPay.as("_rpay")): _*)
    // right (side 0) sorts before left (side 1) at equal ts → inclusive
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .select(col("_side"), col("_lrow"),
        last(col("_rpay"), ignoreNulls = true).over(w).as("_match"))
      .filter(col("_side") === 1)
      .select(col("_lrow.*") +:
        payloadCols.map(c => col("_match").getField(c).as(s"$prefix$c")): _*)
  }
}
