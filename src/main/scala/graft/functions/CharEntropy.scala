package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (nats) of a string's CHARACTER distribution — the
  * cheap single-pass "is this text degenerate?" quality signal: natural
  * prose sits near ~3 nats/char, while boilerplate, repeated padding,
  * base64 walls, and stuck-key junk collapse toward 0 (all-one-char)
  * or pin near ln(alphabet) (uniform random). Used as a pre-filter the
  * way C4/Gopher use repetition ratios (Raffel et al. 2020 §2.2,
  * Rae et al. 2021 appx. A1.1) — doc-local, ZERO exchange, and far
  * cheaper than gram coverage, so it runs first in a cleaning chain.
  *
  * Definition: over the multiset of Unicode code points c with counts
  * n_c in a string of length N (code points, not bytes),
  *   H = ln(N) − (1/N) · Σ_c n_c · ln(n_c)
  * the algebraic form with ONE division — each distinct character
  * contributes a term regardless of alphabet size. Empty string → 0;
  * NULL → NULL (UnaryExpression contract). Values are ulp-stable under
  * any scan order only to ~1e-12, so gates round to 6 dp (the engine
  * parity rule).
  *
  * Kernel shape: a 128-slot array fast path for ASCII plus a spill map
  * for everything else — one pass over the UTF-8 bytes, no
  * per-character allocation for ASCII text. Codegen emits one call to
  * the shared static kernel (no boxing of the double result).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def prettyName: String = "char_entropy"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_entropy requires a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(text: Any): Any =
    CharEntropy.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CharEntropy.compute($t);")

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropy = copy(child = newChild)
}

object CharEntropy {

  /** Static kernel shared by the interpreted and codegen paths. */
  def compute(text: UTF8String): Double = {
    val s = text.toString
    val ascii = new Array[Long](128)
    var spill: java.util.HashMap[Integer, java.lang.Long] = null
    var n = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (spill == null)
          spill = new java.util.HashMap[Integer, java.lang.Long]()
        val prev = spill.get(cp)
        spill.put(cp, if (prev == null) 1L else prev.longValue() + 1L)
      }
      n += 1L
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0.0
    var acc = 0.0
    var c = 0
    while (c < 128) {
      val k = ascii(c)
      if (k > 0L) acc += k * math.log(k.toDouble)
      c += 1
    }
    if (spill != null) {
      // sorted for a deterministic summation order across JVMs (map
      // iteration order would depend on capacity history)
      val keys = new java.util.ArrayList[Integer](spill.keySet())
      java.util.Collections.sort(keys)
      val it = keys.iterator()
      while (it.hasNext) {
        val k = spill.get(it.next()).longValue()
        acc += k * math.log(k.toDouble)
      }
    }
    math.log(n.toDouble) - acc / n
  }
}
