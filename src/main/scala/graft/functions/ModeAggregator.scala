package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable

/** Typed single-pass mode aggregator (SURVEY §2.12: the UDAF candidate
  * that collapses the reference's per-column mode jobs,
  * silver_credit_history.py:31–37).
  *
  * mode(col) as ONE aggregation: the buffer is a value→count map, merge
  * is map-union, finish is argmax with the smallest-value tie-break
  * (same contract as Imputation.modesOf). Registered via functions.udaf
  * — usable as a Column aggregate anywhere groupBy works. The map-side
  * partial aggregation Spark applies to Aggregators is exactly the
  * map-side combine that makes this a single shuffle of (value, count)
  * partials at 100 TB, not a value shuffle.
  *
  * For very-high-cardinality columns prefer the groupBy idiom (bounded
  * state per group); this buffer is per-aggregation-group and grows with
  * distinct values — right for categorical/imputation columns.
  */
object ModeAggregator extends Aggregator[String, mutable.Map[String, Long], String] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long], a: String): mutable.Map[String, Long] = {
    if (a != null) b.update(a, b.getOrElse(a, 0L) + 1L)
    b
  }

  override def merge(x: mutable.Map[String, Long], y: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    y.foreach { case (k, v) => x.update(k, x.getOrElse(k, 0L) + v) }
    x
  }

  override def finish(b: mutable.Map[String, Long]): String =
    if (b.isEmpty) null
    else b.minBy { case (v, c) => (-c, v) }._1

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[String] = Encoders.STRING

  /** Column-API handle: modeOf(col) usable in any agg(). */
  def modeOf(c: Column): Column = udaf(ModeAggregator).apply(c)
}
