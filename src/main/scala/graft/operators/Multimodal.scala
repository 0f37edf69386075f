package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque binary
  * columns + typed metadata, with decode / feature-extraction /
  * resize / frame-sampling plumbing.
  *
  * Decode is MODALITY-ROUTED: audio payloads carrying a RIFF/WAVE PCM
  * container go through a REAL pure-JVM decoder ([[Wav]] — header
  * parse + PCM samples → fixed-dim band-energy features); image/video
  * (no codec libraries in this environment) and non-WAV audio keep the
  * clearly-marked deterministic STUB. Everything around the seam —
  * schema, batch-per-partition processing shape, partitioning, output
  * contract — is identical for both routes, so swapping the remaining
  * stub for an actual image codec call is a one-line change per
  * modality: decode cost amortizes per partition, feature vectors stay
  * distributed, nothing collects to the driver.
  */
object Multimodal {

  case class MediaMeta(modality: String, width: Int, height: Int,
                       sampleRate: Int, durationMs: Long)
  case class MediaRow(media_id: Long, bytes: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, modality: String, n_bytes: Int,
                           features: Array[Float])

  /** STUB decode: a real implementation would hand `bytes` to an image/
    * video codec here. This deterministic fake derives a fixed-length
    * feature vector from a rolling hash of the payload so tests can pin
    * exact outputs. Audio no longer routes here when the payload is a
    * valid WAV — see [[Wav]]. */
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

  /** The modality-routed decode seam: audio payloads that parse as
    * RIFF/WAVE PCM get the REAL decoder (samples → per-band energies,
    * each in [0, 1] — see [[Wav.bandEnergies]]); everything else — and
    * audio bytes that are not a WAV container — falls back to the
    * deterministic stub, whose per-byte contributions are also bounded
    * by 1. Both routes therefore satisfy the mm2 oracle's invariant
    * (0 ≤ Σ features ≤ n_bytes), so swapping routes can never be
    * silently wrong-dim or unbounded. */
  private[operators] def decodeFeatures(row: MediaRow, dim: Int): Array[Float] =
    if (row.meta.modality == "audio")
      Wav.decode(row.bytes) match {
        case Some(pcm) => Wav.bandEnergies(pcm.samples, dim)
        case None => stubDecode(row.bytes, dim)
      }
    else stubDecode(row.bytes, dim)

  /** Batch feature extraction: one partition = one batch, mirroring the
    * mapInPandas/Arrow-batch shape. The iterator is processed lazily —
    * constant memory per partition regardless of partition size. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { row =>
        MediaFeatures(row.media_id, row.meta.modality, row.bytes.length,
          decodeFeatures(row, dim))
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

  /** Wrap a text corpus as media rows — the test/demo entry path.
    * Image/video payloads are the raw utf-8 bytes (deterministic
    * opaque blobs for the stub); AUDIO rows carry a REAL synthesized
    * WAV container — 16-bit PCM mono at 16 kHz, one sample per text
    * byte (sample = (byte − 128) << 8, content-derived and RNG-free) —
    * so the audio route exercises the actual [[Wav]] decoder
    * end-to-end, and the payload size stays SQL-recomputable for the
    * mm1/mm2 oracles: 44 header bytes + 2 per text byte. */
  def fromDocuments(docs: DataFrame, spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val raw = text.getBytes("UTF-8")
        val modality = id % 3 match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val bytes =
          if (modality == "audio")
            Wav.encode(raw.map(b => (((b & 0xFF) - 128) << 8).toShort), 16000)
          else raw
        val durMs =
          if (modality == "audio") raw.length.toLong * 1000L / 16000L
          else raw.length.toLong * 10
        MediaRow(id, bytes, MediaMeta(modality, 64, 64, 16000, durMs))
    }
  }
}

/** Minimal pure-JVM WAV (RIFF/WAVE) codec — the one real decoder a
  * codec-less sandbox can carry. Supports canonical PCM: 8-bit
  * unsigned / 16-bit signed little-endian, any channel count (mixed
  * down to mono), walking the chunk list for `fmt ` and `data` (extra
  * chunks like LIST/fact are skipped, as the spec requires). Decode is
  * total: malformed or non-PCM input yields None, never a throw — the
  * router falls back to the stub.
  */
object Wav {

  case class Pcm(sampleRate: Int, channels: Int, samples: Array[Float])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Parse a RIFF/WAVE PCM container to normalized mono samples in
    * [−1, 1]. None on anything that is not canonical PCM WAV. */
  def decode(bytes: Array[Byte]): Option[Pcm] = {
    if (bytes.length < 44 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
      return None
    var fmt: Option[(Int, Int, Int, Int)] = None // (format, channels, rate, bits)
    var data: Option[(Int, Int)] = None          // (offset, length)
    var o = 12
    while (o + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(bytes, o)
      val len = le32(bytes, o + 4).toInt
      if (len < 0 || o + 8 + len > bytes.length) return None
      if (id == "fmt " && len >= 16)
        fmt = Some((le16(bytes, o + 8), le16(bytes, o + 10),
          le32(bytes, o + 12).toInt, le16(bytes, o + 22)))
      else if (id == "data") data = Some((o + 8, len))
      o += 8 + len + (len & 1) // chunks are word-aligned; odd sizes pad
    }
    (fmt, data) match {
      case (Some((1, ch, rate, bits)), Some((off, len)))
          if ch >= 1 && rate > 0 && (bits == 8 || bits == 16) =>
        val bytesPerFrame = ch * bits / 8
        val n = len / bytesPerFrame
        val out = new Array[Float](n)
        var i = 0
        while (i < n) {
          var acc = 0.0f
          var c = 0
          while (c < ch) {
            val p = off + i * bytesPerFrame + c * bits / 8
            acc +=
              (if (bits == 16) (le16(bytes, p).toShort).toFloat / 32768.0f
               else ((bytes(p) & 0xFF) - 128).toFloat / 128.0f)
            c += 1
          }
          out(i) = acc / ch
          i += 1
        }
        Some(Pcm(rate, ch, out))
      case _ => None
    }
  }

  /** Canonical 44-byte-header mono 16-bit PCM writer — the test/demo
    * synthesis half ([[Multimodal.fromDocuments]]) and the round-trip
    * oracle for [[decode]]. */
  def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Fixed-dim spectral features: mean signal power at `dim` evenly
    * spaced frequencies below Nyquist (normalized frequency
    * f_k = (k+1) / (2·(dim+1)) cycles/sample), each computed by the
    * Goertzel recurrence — O(dim · n) with no FFT dependency. Each
    * band energy is |Σ s_j e^(−i2πf j)|² / n², which for samples in
    * [−1, 1] lies in [0, 1] — the bound the mm2 oracle's invariant
    * leans on. Deterministic; an empty signal yields all-zero bands. */
  def bandEnergies(samples: Array[Float], dim: Int): Array[Float] = {
    val n = samples.length
    val out = new Array[Float](dim)
    if (n == 0) return out
    var k = 0
    while (k < dim) {
      val w = 2.0 * math.Pi * (k + 1).toDouble / (2.0 * (dim + 1))
      val coeff = 2.0 * math.cos(w)
      var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
      var j = 0
      while (j < n) {
        s0 = samples(j) + coeff * s1 - s2
        s2 = s1; s1 = s0
        j += 1
      }
      val power = s1 * s1 + s2 * s2 - coeff * s1 * s2
      out(k) = (power / (n.toDouble * n.toDouble)).toFloat
      k += 1
    }
    out
  }
}
