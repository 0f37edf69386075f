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

  test("Wav: encode→decode round-trips 16-bit PCM exactly") {
    val samples = Array.tabulate(480)(i => ((i * 131) % 65536 - 32768).toShort)
    val bytes = Wav.encode(samples, 16000)
    assert(bytes.length == 44 + samples.length * 2)
    val pcm = Wav.decode(bytes).getOrElse(fail("decode returned None"))
    assert(pcm.sampleRate == 16000 && pcm.channels == 1)
    assert(pcm.samples.length == samples.length)
    // exact: each decoded float is sample/32768
    samples.indices.foreach { i =>
      assert(pcm.samples(i) == samples(i).toFloat / 32768.0f,
        s"sample $i: ${pcm.samples(i)} vs ${samples(i)}")
    }
  }

  test("Wav: malformed and non-PCM payloads decode to None, never throw") {
    assert(Wav.decode(Array[Byte]()).isEmpty)
    assert(Wav.decode("not a wav at all, just text bytes".getBytes).isEmpty)
    // valid header, truncated data chunk length
    val truncated = Wav.encode(Array.tabulate(100)(_.toShort), 8000).take(80)
    assert(Wav.decode(truncated).isEmpty)
  }

  test("Wav.bandEnergies: zero signal is all-zero; a pure tone peaks in its own band") {
    val dim = 16
    assert(Wav.bandEnergies(Array.fill(1000)(0.0f), dim).forall(_ == 0.0f))
    // cosine exactly at band k's normalized frequency (k+1)/(2(dim+1))
    val k = 5
    val f = (k + 1).toDouble / (2.0 * (dim + 1))
    val tone = Array.tabulate(2000)(j => math.cos(2 * math.Pi * f * j).toFloat)
    val bands = Wav.bandEnergies(tone, dim)
    assert(bands.forall(b => b >= 0.0f && b <= 1.0f), "energies must be in [0,1]")
    assert(bands.indexOf(bands.max) == k,
      s"tone at band $k must peak there, got ${bands.toSeq}")
    assert(bands(k) > 0.2f, s"aligned tone energy should be large: ${bands(k)}")
  }

  test("decode seam routes audio through the real WAV decoder, others through the stub") {
    val wav = Wav.encode(Array.tabulate(200)(i => (i * 300).toShort), 16000)
    val audio = MediaRow(1L, wav, MediaMeta("audio", 0, 0, 16000, 12L))
    val image = MediaRow(2L, wav, MediaMeta("image", 64, 64, 0, 0L))
    val real = Multimodal.decodeFeatures(audio, 16)
    val stub = Multimodal.decodeFeatures(image, 16)
    val expected = Wav.bandEnergies(Wav.decode(wav).get.samples, 16)
    assert(real.sameElements(expected), "audio must take the WAV route")
    assert(stub.sameElements(Multimodal.stubDecode(wav, 16)),
      "non-audio must keep the stub route")
    assert(!real.sameElements(stub), "the two routes genuinely differ")
    // audio bytes that are NOT a WAV container fall back to the stub
    val junk = MediaRow(3L, "junk".getBytes, MediaMeta("audio", 0, 0, 0, 0L))
    assert(Multimodal.decodeFeatures(junk, 16)
      .sameElements(Multimodal.stubDecode("junk".getBytes, 16)))
  }

  test("fromDocuments audio rows carry decodable WAV payloads sized 44 + 2·text bytes") {
    val audios = media.filter(_.meta.modality == "audio").collect()
    assert(audios.nonEmpty)
    audios.foreach { r =>
      val pcm = Wav.decode(r.bytes).getOrElse(fail(s"row ${r.media_id} not WAV"))
      assert(r.bytes.length == 44 + 2 * pcm.samples.length)
      assert(pcm.sampleRate == 16000)
    }
  }

  test("Ppm: encode→decode round-trips pixels exactly; header variants parse") {
    val px = Array.tabulate(3 * 5 * 2)(i => ((i * 37) % 256).toByte)
    val bytes = Ppm.encode(5, 2, px)
    val img = Ppm.decode(bytes).getOrElse(fail("decode returned None"))
    assert(img.width == 5 && img.height == 2)
    assert(img.pixels.sameElements(px))
    // whitespace runs + comments are legal header separators
    val weird = ("P6 # a comment\n # more\n 5\t2 \n255\n".getBytes("US-ASCII") ++ px)
    val img2 = Ppm.decode(weird).getOrElse(fail("comment header must parse"))
    assert(img2.pixels.sameElements(px))
  }

  test("Ppm: malformed payloads decode to None, never throw") {
    assert(Ppm.decode(Array[Byte]()).isEmpty)
    assert(Ppm.decode("P3\n1 1\n255\n  0 0 0".getBytes).isEmpty) // ascii PPM ≠ P6
    assert(Ppm.decode("not an image".getBytes).isEmpty)
    val truncated = Ppm.encode(4, 4, new Array[Byte](48)).dropRight(5)
    assert(Ppm.decode(truncated).isEmpty)
    // 2-byte-per-sample maxval is out of scope
    assert(Ppm.decode(("P6\n1 1\n65535\n" + "ab").getBytes).isEmpty)
  }

  test("Ppm.luminanceHistogram: exact bin placement, fractions sum to 1") {
    // 4 pixels with luma 0, 64, 128, 255 → bins 0, 4, 8, 15 at dim 16
    val px = Array[Int](0, 0, 0, 64, 64, 64, 128, 128, 128, 255, 255, 255)
      .map(_.toByte)
    val h = Ppm.luminanceHistogram(Ppm.Rgb(4, 1, px), 16)
    assert(h.length == 16)
    assert(h(0) == 0.25f && h(4) == 0.25f && h(8) == 0.25f && h(15) == 0.25f)
    assert(math.abs(h.map(_.toDouble).sum - 1.0) < 1e-9)
  }

  test("image rows route through the real PPM decoder") {
    val images = media.filter(_.meta.modality == "image").collect()
    assert(images.nonEmpty)
    images.foreach { r =>
      val img = Ppm.decode(r.bytes).getOrElse(fail(s"row ${r.media_id} not PPM"))
      assert(img.height == 1 && img.width == r.meta.width)
      // grayscale strip synthesized from the text bytes: r = g = b
      assert(img.pixels.grouped(3).forall(p => p(0) == p(1) && p(1) == p(2)))
      val feats = Multimodal.decodeFeatures(r, 16)
      assert(feats.sameElements(Ppm.luminanceHistogram(img, 16)),
        "image must take the PPM route")
      assert(math.abs(feats.map(_.toDouble).sum - 1.0) < 1e-5)
    }
    // image bytes that are NOT a PPM container fall back to the stub
    val junk = MediaRow(4L, "junk".getBytes, MediaMeta("image", 1, 1, 0, 0L))
    assert(Multimodal.decodeFeatures(junk, 16)
      .sameElements(Multimodal.stubDecode("junk".getBytes, 16)))
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
