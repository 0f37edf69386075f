package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native positional char-n-gram 128-bit keys: for text `s` and window
  * width `n` (a foldable int literal), emits one struct<h1, h2> per
  * code-point position — bit-equal to the composed pipeline
  * `transform(substr windows) ∘ transform(xxhash64 ×2 lanes)` that
  * `Dedup.removeDupSpansChars` originally used, without ever
  * materializing a window STRING: the kernel walks the UTF-8 bytes
  * once to index code-point offsets, then hashes each window's byte
  * slice in place. The composed version allocates one n-char
  * UTF8String per position (~docLen allocations per doc, each hashed
  * twice more across the two lanes); this is the measured hot path of
  * the char-level dedup rewrite (d18), which is exactly the "custom
  * Expression for a measured kernel" tier of the engine's design
  * rules — same tier as [[CosineSimilarity]].
  *
  * Lane equivalence contract (spec-pinned bit-for-bit against the
  * composed version): h1 = xxhash64(window) (seed 42 over the window
  * bytes), h2 = xxhash64(window, 1) (the int literal 1 folded into
  * h1 — Spark chains multi-arg xxhash64 left to right). Docs shorter
  * than n yield an EMPTY array; a NULL text yields NULL (the composed
  * `when` guard yields an empty array there instead — both produce
  * zero rows under the posexplode every consumer applies).
  */
case class CharGramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "char_gram_hashes"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = left.nullable || right.nullable

  private lazy val n: Int = right.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"char_gram_hashes: window width must be a foldable int literal, got $other")
  }

  override def nullSafeEval(s: Any, ignored: Any): Any =
    CharGramKernel.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, _) => {
      s"${ev.value} = graft.functions.CharGramKernel.compute($c, $n);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharGramHashes =
    copy(left = newLeft, right = newRight)
}

/** The shared eval/codegen kernel — a plain static method so generated
  * code calls it directly (one invocation per row; the per-window loop
  * lives in compiled Scala, which is as JIT-friendly as emitted Java
  * and keeps the generated method tiny). */
object CharGramKernel {

  private val emptyResult = new GenericArrayData(Array.empty[Any])

  def compute(s: UTF8String, n: Int): ArrayData = {
    val numChars = s.numChars()
    val numWin = numChars - n + 1
    if (numWin <= 0) return emptyResult
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val numBytes = s.numBytes()
    // code-point byte offsets: offsets(i) = first byte of char i;
    // offsets(numChars) = end — one O(bytes) walk
    val offsets = new Array[Int](numChars + 1)
    var i = 0
    var b = 0
    while (b < numBytes) {
      offsets(i) = b
      b += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + b))
      i += 1
    }
    offsets(numChars) = numBytes
    val rows = new Array[Any](numWin)
    var w = 0
    while (w < numWin) {
      val start = offsets(w)
      val len = offsets(w + n) - start
      // lane 1: xxhash64(window) — XXH64 over the window bytes, Spark's
      // default seed; lane 2: the int literal 1 chained into lane 1,
      // exactly XxHash64's multi-child fold
      val h1 = XXH64.hashUnsafeBytes(base, off + start, len, 42L)
      val h2 = XXH64.hashInt(1, h1)
      rows(w) = InternalRow(h1, h2)
      w += 1
    }
    new GenericArrayData(rows)
  }
}
