package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE application: segment a whitespace-tokenized text into
  * subword pieces under a TRAINED merge list (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" —
  * the standard greedy lowest-rank-merge-first encoder). `right` is
  * the merge list as a foldable array<string> literal of "left right"
  * pairs in training order; each word is split into characters plus a
  * terminal `</w>` marker, then the applicable merge with the LOWEST
  * training rank is applied repeatedly until none applies. Word-end
  * pieces keep the `</w>` suffix, so detokenization is exactly
  * concat → replace("</w>", " ") → trim — the identity the t21 gate
  * pins.
  *
  * The merge ranking map is built ONCE per expression instance (the
  * literal is plan-constant) and shared across rows; per-word results
  * are memoized per instance, so a Zipfian corpus pays the merge loop
  * per DISTINCT word, not per occurrence. NULL text yields NULL.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "bpe_encode"

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  // BinaryExpression.eval also yields null when the merges argument is
  // null (e.g. bpe_encode(text, NULL) via the SQL registry), so the
  // declaration must cover BOTH children or the expression could
  // produce null while claiming non-nullable
  override def nullable: Boolean = left.nullable || right.nullable

  private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    right.eval() match {
      case a: ArrayData =>
        var i = 0
        while (i < a.numElements()) {
          m.put(a.getUTF8String(i).toString, i)
          i += 1
        }
      case other => throw new IllegalArgumentException(
        s"bpe_encode: merges must be a foldable array<string> literal, got $other")
    }
    m
  }

  @transient private lazy val kernel = new BpeKernel(ranks)

  override def nullSafeEval(text: Any, ignored: Any): Any =
    kernel.encode(text.asInstanceOf[UTF8String])

  // CodegenFallback-style: the kernel is instance state (memo + ranks),
  // so generated code references this expression object
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeExpr", this,
      classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.encodeForCodegen($t);"
    })
  }

  /** Codegen entry point (public so generated code can call it). */
  def encodeForCodegen(text: UTF8String): ArrayData = kernel.encode(text)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)
}

/** The per-expression-instance encoder: merge ranks + a per-word memo
  * (bounded — INSERTION STOPS once `memoCap` distinct words are cached,
  * so adversarial vocabularies pay the merge loop past the cap instead
  * of growing executor memory; nothing is evicted). */
class BpeKernel(ranks: java.util.HashMap[String, Integer])
    extends Serializable {

  private val memoCap = 100000
  @transient private lazy val memo =
    new java.util.HashMap[String, Array[UTF8String]]()

  private def encodeWord(word: String): Array[UTF8String] = {
    val cached = memo.get(word)
    if (cached != null) return cached
    // chars + terminal marker
    var pieces = new scala.collection.mutable.ArrayBuffer[String]()
    word.foreach(c => pieces += c.toString)
    if (pieces.isEmpty) return Array.empty
    pieces(pieces.length - 1) = pieces.last + "</w>"
    // greedy: apply the lowest-rank applicable merge until none applies
    var done = false
    while (!done && pieces.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < pieces.length - 1) {
        val r = ranks.get(pieces(i) + " " + pieces(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        pieces(bestIdx) = pieces(bestIdx) + pieces(bestIdx + 1)
        pieces.remove(bestIdx + 1)
      }
    }
    val out = pieces.map(UTF8String.fromString).toArray
    if (memo.size < memoCap) memo.put(word, out)
    out
  }

  def encode(text: UTF8String): ArrayData = {
    val words = text.toString.trim.split("\\s+")
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    words.foreach { w => if (w.nonEmpty) out ++= encodeWord(w) }
    new GenericArrayData(out.toArray)
  }
}

/** Driver-side BPE TRAINING over a word-frequency table — see
  * [[graft.operators.TextAnalysis.trainBpe]] for the distributed half
  * (one vocab-sized aggregation; the merge loop below runs over the
  * collected dictionary, which is ≪ corpus by Heaps' law and capped).
  */
object BpeTrainer {

  /** Learn `numMerges` merges from (word, count) pairs — the textbook
    * loop: count adjacent-pair frequencies weighted by word count,
    * merge the most frequent pair (ties broken lexicographically so
    * training is deterministic), repeat. Returns "left right" strings
    * in training order. */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int): Seq[String] = {
    // each word as its piece sequence (chars + </w> on the last)
    var words: Array[(Array[String], Long)] = wordCounts.toArray.map {
      case (w, c) =>
        val ps = w.map(_.toString).toArray
        if (ps.nonEmpty) ps(ps.length - 1) = ps.last + "</w>"
        (ps, c)
    }
    val merges = new scala.collection.mutable.ArrayBuffer[String]()
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      val pairCounts = new scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (ps, c) =>
        var i = 0
        while (i < ps.length - 1) {
          val k = (ps(i), ps(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // max by count, ties by lexicographic pair — deterministic
        val best = pairCounts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += s"${best._1} ${best._2}"
        words = words.map { case (ps, c) =>
          if (ps.length < 2) (ps, c)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](ps.length)
            var i = 0
            while (i < ps.length) {
              if (i < ps.length - 1 && ps(i) == best._1 && ps(i + 1) == best._2) {
                out += ps(i) + ps(i + 1)
                i += 2
              } else {
                out += ps(i)
                i += 1
              }
            }
            (out.toArray, c)
          }
        }
      }
      step += 1
    }
    merges.toSeq
  }
}
