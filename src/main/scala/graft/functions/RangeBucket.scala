package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Rank-bucket assignment against a literal ascending cut-point array:
  * returns the number of cut points ≤ the value (binary search), i.e. a
  * bucket in [0, bounds.length]. With cut points taken at the
  * 1/N..(N−1)/N quantiles this is the distribution-aware equivalent of
  * `width_bucket` — equal-POPULATION buckets, so skewed columns still
  * spread across the bucket range instead of collapsing into one
  * uniform-width cell. The Z-order writer's per-column kernel
  * ([[graft.sources.Sources.zorderWrite]]); the cut points come from
  * `approxQuantile` (Greenwald–Khanna — one distributed pass, driver
  * holds only the N−1 doubles that ride the plan as a literal).
  *
  * Ties count as ≤ (a value equal to a cut point lands in the upper
  * bucket), NaN compares below every cut point → bucket 0; both are
  * deterministic, which is all a layout key needs. Null → null
  * (BinaryExpression contract); callers coalesce to a sentinel bucket.
  */
case class RangeBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "range_bucket"
  override def nullable: Boolean = left.nullable || right.nullable

  require(right.foldable, "range_bucket requires literal cut points")

  @transient private lazy val bounds: Array[Double] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    require(arr != null, "range_bucket: cut-point literal is null")
    arr.toDoubleArray()
  }

  /** Upper bound: first index whose cut point exceeds v. */
  private def bucketOf(v: Double): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def nullSafeEval(v: Any, unused: Any): Any =
    bucketOf(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bounds", bounds, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0; int $hi = $b.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($b[$mid] <= $v) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RangeBucket =
    copy(left = newLeft, right = newRight)
}
