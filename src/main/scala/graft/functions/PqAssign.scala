package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Native PQ assignment: for a float-vector column and a codebooks
  * literal (array<array<array<float>>> — [subspace][centroid][dim]),
  * emits struct(code array<int>, recon_norm double): per subspace the
  * squared-euclidean-nearest centroid index (first match on ties, the
  * `array_position(array_min)` rule of the composed version), and
  * Σⱼ |cbⱼ[codeⱼ]|² — the reconstruction norm ADC cosine divides by.
  *
  * Replaces the composed m×k `aggregate(zip_with(...))` distance folds
  * in `Similarity.pqEncode`: higher-order functions evaluate
  * interpreted (NOTES gotcha 26), so the composed encode paid ~m·k·
  * subDim closure calls per row where this kernel runs one compiled
  * loop. Encode is THE bulk map pass of the PQ family at corpus scale,
  * which is what puts it in the native-Expression tier
  * (CharGramHashes/WordGramCoverage precedent).
  *
  * The codebooks literal parses ONCE per expression instance; vectors
  * whose length ≠ m·subDim throw (a mis-sliced input must fail loud,
  * not encode garbage). NULL vector yields NULL.
  */
case class PqAssign(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "pq_assign"

  override def dataType: DataType = StructType(Seq(
    StructField("code", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("recon_norm", DoubleType, nullable = false)))

  // both children: a null codebook literal nulls the result too
  override def nullable: Boolean = left.nullable || right.nullable

  // [subspace][centroid][dim] floats + per-(subspace, centroid) |c|²
  @transient private lazy val (cents, norm2): (Array[Array[Array[Float]]], Array[Array[Double]]) = {
    val a = right.eval() match {
      case ad: ArrayData => ad
      case other => throw new IllegalArgumentException(
        s"pq_assign: codebooks must be a foldable literal, got $other")
    }
    val cs = Array.tabulate(a.numElements()) { j =>
      val sub = a.getArray(j)
      Array.tabulate(sub.numElements()) { c =>
        sub.getArray(c).toFloatArray()
      }
    }
    val n2 = cs.map(_.map(c =>
      c.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble)))
    (cs, n2)
  }

  override def nullSafeEval(vec: Any, ignored: Any): Any =
    assign(vec.asInstanceOf[ArrayData])

  /** Codegen entry point (public so generated code can call it). */
  def assign(vec: ArrayData): InternalRow = {
    val v = vec.toFloatArray()
    val m = cents.length
    val subDim = cents(0)(0).length
    require(v.length == m * subDim,
      s"pq_assign: vector length ${v.length} != $m subspaces × $subDim dims")
    val codes = new Array[Any](m)
    var norm = 0.0
    var j = 0
    while (j < m) {
      val cbs = cents(j)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cbs.length) {
        val cb = cbs(c)
        var d = 0.0
        var t = 0
        while (t < subDim) {
          val diff = v(j * subDim + t).toDouble - cb(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      norm += norm2(j)(best)
      j += 1
    }
    InternalRow(new GenericArrayData(codes), norm)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqExpr", this, classOf[PqAssign].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.assign($v);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAssign =
    copy(left = newLeft, right = newRight)
}
