package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two float-array columns.
  *
  * The composable equivalent (aggregate ∘ zip_with ∘ transform,
  * graft.operators.Similarity.cosine) materializes intermediate arrays
  * per row; this expression is a single fused loop — no allocations, one
  * pass, whole-stage-codegen friendly. Accumulation is double,
  * element-order identical to the composed version, so results are
  * bit-equal and oracle-compatible.
  *
  * Preference order per the engine's design rules: compose built-ins
  * first; drop to a native Expression only for a measured hot path —
  * this is the ANN scoring kernel (SURVEY: similarity search at scale).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // no ExpectsInputTypes: AbstractDataType is private[sql] in Spark 4.
  // Inputs must be array<float>; wrong types surface as a cast error at
  // execution (the engine's Column-API entry point guarantees the type).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // ragged inputs yield NULL — matching the composed zip_with version,
  // where the null pad poisons the whole aggregate. Truncating to the
  // shorter array would silently score corrupt vectors.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = (double) $a.getFloat($i);
         |    double $yv = (double) $b.getFloat($i);
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** cos(x, x) without the three accumulators: null → null, any NaN/Inf
  * element → NaN (matching what the full kernel's arithmetic yields),
  * all-zero or empty → NaN (0/0), else 1.0. One pass over ONE array —
  * the SelfCosineRule rewrite target. */
case class SelfCosine(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "self_cosine"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var anyNonZero = false
    var i = 0
    while (i < n) {
      val v = x.getFloat(i)
      if (java.lang.Float.isNaN(v) || java.lang.Float.isInfinite(v))
        return Double.NaN
      if (v != 0.0f) anyNonZero = true
      i += 1
    }
    if (anyNonZero) 1.0 else Double.NaN
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val nz = ctx.freshName("nz")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $nz = false; boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  float $v = $a.getFloat($i);
         |  if (Float.isNaN($v) || Float.isInfinite($v)) { $bad = true; break; }
         |  if ($v != 0.0f) $nz = true;
         |}
         |${ev.value} = $bad ? Double.NaN : ($nz ? 1.0 : Double.NaN);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SelfCosine =
    copy(child = newChild)
}
