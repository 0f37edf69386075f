package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque binary
  * columns + typed metadata, with decode / feature-extraction /
  * resize / frame-sampling plumbing.
  *
  * The decode step is a clearly-marked deterministic STUB (no codec
  * libraries in this environment); everything around it — schema,
  * batch-per-partition processing shape, partitioning, output contract —
  * is real. Swap `stubDecode` for an actual codec call per batch and the
  * operator is production-shaped: decode cost amortizes per partition,
  * feature vectors stay distributed, nothing collects to the driver.
  */
object Multimodal {

  case class MediaMeta(modality: String, width: Int, height: Int,
                       sampleRate: Int, durationMs: Long)
  case class MediaRow(media_id: Long, bytes: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, modality: String, n_bytes: Int,
                           features: Array[Float])

  /** STUB decode: a real implementation would hand `bytes` to an image/
    * audio codec here. This deterministic fake derives a fixed-length
    * feature vector from a rolling hash of the payload so tests can pin
    * exact outputs. */
  private[operators] def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // deterministic seed
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      out(math.floorMod(i, dim).toInt) += (math.floorMod(h, 1000L) / 1000.0f)
      i += 1
    }
    out
  }

  /** Batch feature extraction: one partition = one batch, mirroring the
    * mapInPandas/Arrow-batch shape. The iterator is processed lazily —
    * constant memory per partition regardless of partition size. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { row =>
        MediaFeatures(row.media_id, row.meta.modality, row.bytes.length,
          stubDecode(row.bytes, dim))
      }
    }
  }

  /** Metadata-level resize: contract-checked without touching pixels
    * (a real impl would re-encode bytes per batch in the same place). */
  def resizeMeta(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r => r.copy(meta = r.meta.copy(width = w, height = h)))
  }

  /** Frame sampling for video-shaped rows: every `everyMs` milliseconds
    * of duration yields one (media_id, frame_idx, offset_ms) row —
    * a generator (explode) over the metadata, no decode needed to plan. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media
      // zero-duration media yields no frames; sequence(0, -1, step) would
      // throw on descending bounds (same guard as Dedup.shingles)
      .filter(col("meta.modality") === "video" && col("meta.durationMs") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("meta.durationMs") - 1, lit(everyMs)))
          .as("offset_ms"))
      .withColumn("frame_idx", (col("offset_ms") / everyMs).cast("long"))

  /** Wrap a text corpus as fake media rows (deterministic payloads) —
    * the test/demo entry path. */
  def fromDocuments(docs: DataFrame, spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val modality = id % 3 match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, bytes,
          MediaMeta(modality, 64, 64, 16000, durationMs = bytes.length.toLong * 10))
    }
  }
}
