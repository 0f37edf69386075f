package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Native word-n-gram char-coverage kernel: for a token array and a
  * contiguous gram-size range [minN, maxN] (foldable int literals),
  * emits one struct<maxp, dups> per n — maxp = max over distinct grams
  * of count × charLen(gram), dups = Σ over grams with count ≥ 2 of
  * count × charLen(gram); charLen counts the joined-with-single-spaces
  * rendering (Σ token chars + n − 1), exactly what `length()` of the
  * composed gram string measures.
  *
  * This replaces nine interpreted `aggregate(array_sort(...))`
  * higher-order pipelines in `TextAnalysis.gopherRules` — Spark's HOFs
  * are CodegenFallback, so the composed version paid per-element
  * closure evaluation AND a per-n sort; measured 13.3 s for the t20
  * battery slice vs ~1 s with this kernel (the CharGramHashes tier:
  * custom Expression for a measured hot kernel). One pass indexes
  * token hashes + prefix char lengths; each n then counts gram-hash
  * runs in a hash map — O(g · (maxN − minN + 1)) per doc, no string
  * materialization, no sort.
  *
  * Grams are keyed by a 64-bit chain of per-token xxhash64 values (the
  * d9 convention: 8-byte keys for MEASUREMENT operators — a within-doc
  * collision merges two gram counts with probability ~g²/2⁶⁴ per doc,
  * noise for a filter signal; the DuckDB oracle counts raw strings and
  * stays green across all SFs). Docs shorter than n yield (0, 0) for
  * that n; a NULL token array yields NULL.
  */
case class WordGramCoverage(first: Expression, second: Expression,
                            third: Expression)
    extends TernaryExpression {

  override def prettyName: String = "word_gram_coverage"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("maxp", LongType, nullable = false),
      StructField("dups", LongType, nullable = false))),
    containsNull = false)

  // all three children: TernaryExpression.eval nulls out if ANY is null
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  private lazy val minN: Int = second.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"word_gram_coverage: minN must be a foldable int literal, got $other")
  }
  private lazy val maxN: Int = third.eval() match {
    case i: Int if i >= minN => i
    case other => throw new IllegalArgumentException(
      s"word_gram_coverage: maxN must be a foldable int literal >= minN, got $other")
  }

  override def nullSafeEval(toks: Any, ignored1: Any, ignored2: Any): Any =
    WordGramCoverageKernel.compute(toks.asInstanceOf[ArrayData], minN, maxN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _, _) => {
      s"${ev.value} = graft.functions.WordGramCoverageKernel.compute($t, $minN, $maxN);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): WordGramCoverage =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Shared eval/codegen kernel (see [[CharGramKernel]] for why a plain
  * static method: the per-gram loops live in compiled Scala and the
  * generated method stays tiny). */
object WordGramCoverageKernel {

  def compute(toks: ArrayData, minN: Int, maxN: Int): ArrayData = {
    val g = toks.numElements()
    // one pass: per-token hash + prefix char lengths
    val pref = new Array[Long](g + 1)
    val th = new Array[Long](g)
    var i = 0
    while (i < g) {
      val t = toks.getUTF8String(i)
      pref(i + 1) = pref(i) + t.numChars()
      th(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
        t.numBytes, 42L)
      i += 1
    }
    val out = new Array[Any](maxN - minN + 1)
    var n = minN
    while (n <= maxN) {
      val numWin = g - n + 1
      if (numWin <= 0) out(n - minN) = InternalRow(0L, 0L)
      else {
        // value = Array(count, gramCharLen); grams with equal hash have
        // equal strings (collision aside), hence equal char length
        val counts = new java.util.HashMap[java.lang.Long, Array[Long]](
          numWin * 2)
        var w = 0
        while (w < numWin) {
          var h = 42L
          var j = w
          while (j < w + n) { h = XXH64.hashLong(th(j), h); j += 1 }
          val len = pref(w + n) - pref(w) + (n - 1)
          val e = counts.get(h)
          if (e == null) counts.put(h, Array(1L, len)) else e(0) += 1
          w += 1
        }
        var maxp = 0L
        var dups = 0L
        val it = counts.values().iterator()
        while (it.hasNext) {
          val e = it.next()
          val prod = e(0) * e(1)
          if (prod > maxp) maxp = prod
          if (e(0) >= 2) dups += prod
        }
        out(n - minN) = InternalRow(maxp, dups)
      }
      n += 1
    }
    new GenericArrayData(out)
  }
}
