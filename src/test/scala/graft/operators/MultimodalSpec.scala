package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  private lazy val media = fromDocuments(
    Tables.documents(spark, sf).limit(60), spark).cache()

  test("binary payload + typed metadata schema") {
    val s = media.toDF().schema
    assert(s("bytes").dataType.typeName == "binary")
    assert(s("meta").dataType.typeName == "struct")
    assert(media.filter(_.bytes.isEmpty).count() == 0)
  }

  test("feature extraction is deterministic, batch-shaped, fixed-dim") {
    val f1 = extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    val f2 = extractFeatures(media.repartition(7), dim = 16).collect().sortBy(_.media_id)
    assert(f1.length == 60)
    assert(f1.forall(_.features.length == 16))
    // partitioning must not change results (batch shape is an impl detail)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.media_id == b.media_id && a.features.sameElements(b.features))
    }
    // n_bytes matches the utf-8 payload
    val n = media.filter(_.media_id == f1.head.media_id).head().bytes.length
    assert(f1.head.n_bytes == n)
  }

  test("resizeMeta rewrites metadata only") {
    val r = resizeMeta(media, 224, 224).collect()
    assert(r.forall(x => x.meta.width == 224 && x.meta.height == 224))
    val orig = media.collect().map(x => x.media_id -> x.bytes.length).toMap
    assert(r.forall(x => x.bytes.length == orig(x.media_id)))
  }

  test("sampleFrames yields no frames (not an error) for zero-duration video") {
    val zero = Seq(MediaRow(99L, Array[Byte](), MediaMeta("video", 1, 1, 0, 0L)))
      .toDS()
    assert(sampleFrames(zero.toDF(), 500).count() == 0)
  }

  test("sampleFrames explodes video rows on a time grid") {
    val frames = sampleFrames(media.toDF(), everyMs = 500)
    val vids = media.filter(_.meta.modality == "video").collect()
    val expected = vids.map(v => 1 + (v.meta.durationMs - 1) / 500).sum
    assert(frames.count() == expected)
    assert(frames.groupBy("media_id").agg(min("offset_ms").as("m"))
      .filter($"m" =!= 0L).count() == 0)
  }
}
