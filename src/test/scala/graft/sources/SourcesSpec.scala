package graft.sources

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv sink + schema'd scan round-trips exactly") {
    val dir = Files.createTempDirectory("csvrt").toString + "/nation"
    val nation = Tables.nation(spark, sf)
    Sources.writeCsv(nation, dir)
    val back = Sources.csv(spark, dir, Some(nation.schema))
    assert(back.schema == nation.schema)
    assert(back.except(nation).count() == 0 && nation.except(back).count() == 0)
  }

  test("malformed CSV rows: PERMISSIVE captures, DROPMALFORMED drops") {
    // a crawl-grade ingest never gets clean CSVs; the engine must
    // quarantine bad rows without failing the batch (ANSI mode makes
    // silent coercion an exception, so the mode choice is load-bearing)
    val dir = Files.createTempDirectory("badcsv").toString
    val csv = Seq(
      "id,price,when",
      "1,10.5,2024-01-02",
      "2,notanumber,2024-01-03",      // unparseable double
      "3,30.25,2024-01-04",
      "garbage line without commas",  // wrong arity
      "5,50.0,2024-01-06").mkString("\n")
    Files.write(java.nio.file.Paths.get(s"$dir/batch.csv"), csv.getBytes)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id INT, price DOUBLE, `when` DATE, _bad STRING")
    val permissive = spark.read
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .schema(schema).csv(s"$dir/batch.csv")
      .cache() // the corrupt-record column must be materialized once
    assert(permissive.count() == 5)
    assert(permissive.filter($"_bad".isNotNull).count() == 2)
    // good rows parse fully; quarantined rows keep their raw text
    assert(permissive.filter($"_bad".isNull).agg(sum($"price")).first.getDouble(0)
      == 90.75)
    assert(permissive.filter($"_bad".isNotNull).select("_bad")
      .as[String].collect().exists(_.contains("notanumber")))
    val dropped = spark.read
      .option("header", "true").option("mode", "DROPMALFORMED")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "id INT, price DOUBLE, `when` DATE")).csv(s"$dir/batch.csv")
    // count() alone would parse NO columns (CSV count pushdown) and see
    // nothing malformed — malformedness is per-REQUESTED-column, so
    // drop counts must be taken over a full-width projection
    assert(dropped.select($"id", $"price", $"when").collect().length == 3)
    assert(dropped.count() == 5, "count pushdown skips parsing by design")
  }

  test("compactParquet merges small files without touching content") {
    val base = Files.createTempDirectory("compact").toString
    val docs = Tables.documents(spark, sf)
    docs.repartition(64).write.mode("overwrite").parquet(s"$base/small")
    val smallCount = new java.io.File(s"$base/small").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(smallCount == 64, s"fixture should land 64 files, got $smallCount")
    // target sized so the whole table fits ONE file
    val nOut = Sources.compactParquet(spark, s"$base/small", s"$base/big",
      targetFileBytes = 1L << 30)
    assert(nOut == 1, s"expected 1 compacted file, got $nOut")
    val back = spark.read.parquet(s"$base/big")
    assert(back.count() == docs.count())
    assert(back.except(docs).count() == 0 && docs.except(back).count() == 0)
    // a small target must yield multiple files (census drives the count)
    val nMulti = Sources.compactParquet(spark, s"$base/small", s"$base/multi",
      targetFileBytes = 64L << 10)
    assert(nMulti > 1, s"64 KB target over >64 KB of data must split, got $nMulti")
  }

  test("compactParquet census sees Hive-partitioned data files") {
    // partitioned sinks put data under key=value subdirs — a flat
    // listing would census 0 bytes, collapse the rewrite to ONE file,
    // and silently ignore targetFileBytes
    val base = Files.createTempDirectory("compactpart").toString
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").partitionBy("lang").parquet(s"$base/part")
    val nOut = Sources.compactParquet(spark, s"$base/part", s"$base/out",
      targetFileBytes = 64L << 10)
    assert(nOut > 1, s"64 KB target over a partitioned source must split, got $nOut")
    val back = spark.read.parquet(s"$base/out")
    assert(back.count() == docs.count())
    // the partition column survives as a data column after the rewrite
    assert(back.columns.sorted.toSeq == docs.columns.sorted.toSeq)
  }

  test("compactParquet refuses a source with no data files") {
    val base = Files.createTempDirectory("compactempty").toString
    Files.createDirectory(java.nio.file.Paths.get(s"$base/empty"))
    val e = intercept[IllegalArgumentException](
      Sources.compactParquet(spark, s"$base/empty", s"$base/out"))
    assert(e.getMessage.contains("no .parquet data files"))
  }

  test("compactParquet census ignores _temporary residue like the reader does") {
    // a crashed write leaves staging files under _temporary that
    // spark.read excludes — the census must not size the rewrite off
    // trash, and a residue-only dir must still fail loudly
    val base = Files.createTempDirectory("compacttmp").toString
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").parquet(s"$base/src")
    val stage = java.nio.file.Paths.get(s"$base/src/_temporary/0")
    Files.createDirectories(stage)
    Files.write(stage.resolve("part-junk.parquet"), Array.fill(1 << 20)(0x42.toByte))
    val nOut = Sources.compactParquet(spark, s"$base/src", s"$base/out",
      targetFileBytes = 1L << 30)
    assert(nOut == 1, "1 MB of staging junk must not inflate the census")
    assert(spark.read.parquet(s"$base/out").count() == docs.count())
    val residueOnly = java.nio.file.Paths.get(s"$base/residue/_temporary")
    Files.createDirectories(residueOnly)
    Files.write(residueOnly.resolve("part-junk.parquet"), Array[Byte](1, 2, 3))
    val e = intercept[IllegalArgumentException](
      Sources.compactParquet(spark, s"$base/residue", s"$base/out2"))
    assert(e.getMessage.contains("no .parquet data files"))
  }

  test("FS-routed sidecar round-trips through the Hadoop filesystem") {
    val dir = Files.createTempDirectory("fssidecar").toString
    val kv = Map("shingleSize" -> "3", "numHashes" -> "64",
      "minhashSeed" -> "42", "formatVersion" -> "1")
    Sources.writeJsonSidecarFs(spark, s"$dir/_meta.json", kv)
    assert(Sources.readJsonSidecarFs(spark, s"$dir/_meta.json") == kv)
    // and the two routes agree on the wire format
    assert(Sources.readJsonSidecar(s"$dir/_meta.json") == kv)
  }

  test("malformed JSONL rows: PERMISSIVE quarantines, DROPMALFORMED drops") {
    // JSON Lines is the LLM-corpus interchange format and crawl-grade
    // corpora always carry truncated/invalid lines; same contract as
    // the CSV quarantine: capture without failing the batch
    val dir = Files.createTempDirectory("badjsonl").toString
    val jsonl = Seq(
      """{"doc_id": 1, "text": "good one"}""",
      """{"doc_id": 2, "text": "truncated""",        // unterminated string
      """{"doc_id": 3, "text": "good two"}""",
      """not json at all""",
      """{"doc_id": "five", "text": "bad id type"}""").mkString("\n")
    Files.write(java.nio.file.Paths.get(s"$dir/batch.jsonl"), jsonl.getBytes)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, _bad STRING")
    val permissive = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .schema(schema).json(s"$dir/batch.jsonl")
      .cache()
    assert(permissive.count() == 5)
    // quarantined: the two unparseable lines plus the type mismatch
    assert(permissive.filter($"_bad".isNotNull).count() == 3)
    assert(permissive.filter($"_bad".isNull && $"doc_id".isNotNull).count() == 2)
    permissive.unpersist()
    val dropped = spark.read
      .option("mode", "DROPMALFORMED")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING"))
      .json(s"$dir/batch.jsonl")
    assert(dropped.select("doc_id", "text").collect().length == 2)
  }

  test("json sidecar round-trips (grade_mapping shape) without a Spark job") {
    val p = Files.createTempDirectory("sidecar").toString + "/mapping.json"
    val kv = Map("A" -> "0", "B" -> "1", "model" -> "lgbm \"best\"",
      "note" -> "tab\there\nand \\u00e9: é")
    Sources.writeJsonSidecar(p, kv)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // identical sentinel actions bracket the read; listener events
      // deliver in order, so once the second sentinel's events arrived,
      // any job started by the read would already have been counted —
      // total must be exactly twice the first sentinel's job count
      def sentinel(): Unit = spark.range(1).count()
      def awaitAtLeast(k: Int): Int = {
        val deadline = System.nanoTime() + 10_000_000_000L
        while (jobs.get() < k && System.nanoTime() < deadline) Thread.sleep(20)
        jobs.get()
      }
      sentinel()
      val base = awaitAtLeast(1)
      assert(Sources.readJsonSidecar(p) == kv)
      sentinel()
      val total = awaitAtLeast(2 * base)
      assert(total == 2 * base, "sidecar read must be driver-side, no Spark job")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("sidecar read accepts reference-shaped unquoted scalars and rejects truncation") {
    // the reference json.dumps numbers/booleans unquoted
    // (dag_functions.py:344–357) — bare tokens parse as their string form
    val p = Files.createTempDirectory("sidecar2").toString + "/tracker.json"
    Files.writeString(java.nio.file.Paths.get(p),
      """{"last_retraining_date": "2024-01-07", "model_version": 3,
        | "macro_f1_score": 0.9123, "healthy": true, "note": null}""".stripMargin)
    assert(Sources.readJsonSidecar(p) == Map(
      "last_retraining_date" -> "2024-01-07", "model_version" -> "3",
      "macro_f1_score" -> "0.9123", "healthy" -> "true", "note" -> "null"))
    // truncated input fails with the parse require, not an index error
    val bad = Files.createTempDirectory("sidecar3").toString + "/bad.json"
    Files.writeString(java.nio.file.Paths.get(bad), """{"k": "unterminated""")
    val e = intercept[IllegalArgumentException](Sources.readJsonSidecar(bad))
    assert(e.getMessage.contains("sidecar parse"))
  }

  test("directory catalog lists week partitions by prefix") {
    val root = Files.createTempDirectory("cat")
    Seq("feature_store_week_2024_01_07", "feature_store_week_2024_01_14",
      "label_store_week_2024_01_07").foreach(d =>
      Files.createDirectory(root.resolve(d)))
    val weeks = Sources.listPartitions(spark, root.toString, "feature_store_week_")
    assert(weeks == Seq("feature_store_week_2024_01_07", "feature_store_week_2024_01_14"))
    assert(Sources.exists(spark, root.toString))
    assert(!Sources.exists(spark, root.toString + "/nope"))
  }

  test("parquet metrics store appends and reads back") {
    val p = Files.createTempDirectory("ms").toString + "/metrics"
    val store = new ParquetMetricsStore(p)
    store.append(Seq(("2024_01_07", "lgbm", 0.91)).toDF("week_date", "model_name", "macro_f1"))
    store.append(Seq(("2024_01_14", "lgbm", 0.89)).toDF("week_date", "model_name", "macro_f1"))
    val back = store.read(spark)
    assert(back.count() == 2)
    assert(back.agg(max("macro_f1")).as[Double].first() == 0.91)
  }

  test("multi-path parquet scan unions weeks (S4)") {
    val root = Files.createTempDirectory("wk").toString
    Seq("w1", "w2").zipWithIndex.foreach { case (w, i) =>
      Seq((i, s"row$i")).toDF("k", "v").write.parquet(s"$root/$w") }
    val both = Sources.parquet(spark, s"$root/w1", s"$root/w2")
    assert(both.count() == 2)
  }

  test("manifest-committed publish: atomic visibility, replay, GC, loud reads") {
    val dir = Files.createTempDirectory("pub").toString + "/table"
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b2 = Seq((3L, "c")).toDF("id", "v")
    // reading a never-published dir fails loudly (no manifest ≠ empty)
    intercept[IllegalArgumentException](Sources.readPublished(spark, dir))
    Sources.publishBatch(b1, dir, 1L)
    assert(Sources.publishedBatches(spark, dir) == Seq(1L))
    // crash residue A: a data dir that never reached a manifest
    Seq((99L, "orphan")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/data/batch=7")
    // crash residue B: a torn manifest tmp (crashed before rename)
    Sources.writeJsonSidecarFs(spark, s"$dir/_manifest.v9.json.tmp",
      Map("batches" -> "1,7"))
    Sources.publishBatch(b2, dir, 2L)
    val ids = Sources.readPublished(spark, dir)
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L), "only committed batches are visible")
    // replaying a batch converges: same manifest set, same rows
    Sources.publishBatch(b2, dir, 2L)
    assert(Sources.publishedBatches(spark, dir) == Seq(1L, 2L))
    assert(Sources.readPublished(spark, dir).count() == 3)
    // superseded manifest versions are GC'd, RETAINING N-1 as the grace
    // copy for the reader-vs-GC race publishedBatches' retry documents:
    // after three commits exactly {v2, v3} remain
    val manifests = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.matches("_manifest\\.v\\d+\\.json")).sorted
    assert(manifests.toSeq == Seq("_manifest.v2.json", "_manifest.v3.json"),
      s"expected v2+v3 to remain, got ${manifests.toSeq}")
  }

  test("compactPublished/zorderPublished: one-commit maintenance, old batches orphaned") {
    val dir = Files.createTempDirectory("pubmaint").toString + "/table"
    val docs = Tables.documents(spark, sf)
    // three fragmented publishes (16 files each) + crash residue
    Sources.publishBatch(docs.filter($"doc_id" % 3 === 0).repartition(16), dir, 1L)
    Sources.publishBatch(docs.filter($"doc_id" % 3 === 1).repartition(16), dir, 2L)
    Sources.publishBatch(docs.filter($"doc_id" % 3 === 2).repartition(16), dir, 3L)
    docs.limit(10).write.mode("overwrite").parquet(s"$dir/data/batch=99")
    def filesUnder(b: Long) = {
      val d = new java.io.File(s"$dir/data/batch=$b")
      if (!d.exists) 0 else d.listFiles().count(_.getName.endsWith(".parquet"))
    }
    assert(Seq(1L, 2L, 3L).map(filesUnder).sum == 48)
    val (newId, nOut) = Sources.compactPublished(spark, dir,
      targetFileBytes = 1L << 30)
    // maintenance ids live in their own range: above every dir that
    // ever landed (orphans included — a replayed batch=99 must not
    // overwrite compacted data) AND above any ingest counter's reach —
    // a streaming publisher's next batchId+1 would otherwise collide
    assert(newId == Sources.maintenanceIdBase,
      s"expected the maintenance-range floor, got $newId")
    assert(nOut == 1, s"1 GiB target must compact to one file, got $nOut")
    assert(Sources.publishedBatches(spark, dir) == Seq(newId))
    val after = Sources.readPublished(spark, dir)
    assert(after.except(docs).count() == 0 && docs.except(after).count() == 0,
      "compaction must be content-identical")
    // old batch dirs survive on disk as INVISIBLE orphans (GC'able)
    assert(Seq(1L, 2L, 3L).map(filesUnder).sum == 48)
    // shallow time travel: the retained N-1 manifest (v3, the
    // pre-compaction state) is still readable AND content-equal to the
    // current version — the flip changed layout, never rows
    val before = Sources.readPublishedVersion(spark, dir, 3)
    assert(before.except(after).count() == 0 && after.except(before).count() == 0,
      "version N-1 must read the same rows through the old layout")
    intercept[IllegalArgumentException](
      Sources.readPublishedVersion(spark, dir, 1)) // aged out
    // vacuum honors the N-1 grace manifest: right after the compaction
    // commit, {1,2,3} are still referenced by the retained previous
    // version (a reader may be mid-scan on them) — only the
    // never-referenced crash residue 99 is deletable
    assert(Sources.vacuumPublished(spark, dir) == Seq(99L))
    assert(Seq(1L, 2L, 3L).map(filesUnder).sum == 48,
      "grace-referenced batches must survive vacuum")
    // z-order republish: same one-commit flip, content untouched
    val (zId, _) = Sources.zorderPublished(spark, dir,
      Seq("doc_id", "n_chars"), nFiles = 4)
    assert(zId == Sources.maintenanceIdBase + 1)
    assert(Sources.publishedBatches(spark, dir) == Seq(zId))
    val zBack = Sources.readPublished(spark, dir)
    assert(zBack.except(docs).count() == 0 && docs.except(zBack).count() == 0,
      "z-order republish must be content-identical")
    // the z-order commit aged {1,2,3} out of the last two manifests —
    // NOW vacuum reclaims them, and the live table is untouched
    assert(Sources.vacuumPublished(spark, dir) == Seq(1L, 2L, 3L))
    assert(Seq(1L, 2L, 3L).map(filesUnder).sum == 0, "orphans reclaimed")
    assert(Sources.readPublished(spark, dir).count() == docs.count(),
      "vacuum must never touch live data")
  }
}
