package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a serialized Bloom filter.
  *
  * `left` is the LongType key under test (the engine probes xxhash64 gram
  * hashes); `right` is a foldable BinaryType literal holding a
  * `org.apache.spark.util.sketch.BloomFilter` in its `writeTo` wire
  * format. The filter rides the plan as plain literal bytes — ~1.8
  * bytes/key at fpp 1e-3 (≈ 180 MiB per 100 M keys; budget broadcast
  * memory from THAT figure, and note the JVM byte-array cap bounds a
  * single literal at ~2 GB ≈ 1.1 B keys — shard the filter by key
  * range past that) — and each JVM deserializes it once, lazily;
  * per-row work is two hash mixes and a couple of bit probes, fused
  * into whole-stage codegen via a reference object (the same shape
  * Spark's own runtime row-level filtering uses, so it inherits that
  * path's serialization guarantees).
  *
  * This is the scale primitive behind `Dedup.bloomContaminationPairs`:
  * a probe side that is ~50× smaller than the exact key set lets the
  * big-table prefilter stay map-side when broadcasting the full key set
  * is no longer feasible. One-sided error only — a Bloom filter has no
  * false negatives, so a downstream exact verify over the surviving
  * sliver restores exactness.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def nullable: Boolean = left.nullable || right.nullable

  // The filter bytes must be plan-constant: a non-foldable right child
  // would force a per-row deserialization, which is never what a caller
  // wants. Checked at construction, not execution.
  require(right.foldable, "bloom_might_contain requires a literal filter")

  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom_might_contain: filter literal is null")
    BloomFilter.readFrom(bytes)
  }

  override def nullSafeEval(key: Any, unused: Any): Any =
    filter.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference object, not inline deserialization: the materialized
    // filter is registered once per generated class and shared by every
    // row the stage processes (the literal's own codegen is just an
    // index into the same references array — the bytes are never copied)
    val bf = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (key, _) => s"${ev.value} = $bf.mightContainLong($key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  /** Serialize a driver-built filter to the literal wire format. */
  def toBytes(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
