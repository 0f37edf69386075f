package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Source/sink surface (SURVEY §2.1): CSV, Parquet, JSON sidecars,
  * metrics store behind a trait, directory-listing catalog.
  */
object Sources {

  /** S1/S2 — CSV scan with declared schema (engine default) or inference
    * (compat option, discouraged — SURVEY §1.3). */
  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** S6 — CSV sink with header. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** S3/S4 — parquet scan over one or many paths (implicit union). */
  def parquet(spark: SparkSession, paths: String*): DataFrame =
    spark.read.parquet(paths: _*)

  /** S5 — parquet sink. */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** S9 — JSON sidecar (driver-side metadata: trackers, mappings).
    * Plain JVM I/O, not a Spark job — these are O(1) control files. */
  def writeJsonSidecar(path: String, kv: Map[String, String]): Unit =
    Files.write(Paths.get(path), jsonBody(kv).getBytes(StandardCharsets.UTF_8))

  // one serializer for both sidecar writers — a fix to the escaping or
  // ordering must not be able to miss a twin
  private def jsonBody(kv: Map[String, String]): String =
    kv.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${escape(k)}": "${escape(v)}"""" }
      .mkString("{", ", ", "}")

  /** Sidecar read is driver-side JVM I/O like the write: a 100-week
    * lifecycle reads its tracker 100 times, and a Spark job per O(1)
    * control file would dominate the loop. Accepts the flat object
    * `writeJsonSidecar` emits AND reference-shaped trackers where
    * numbers/booleans are unquoted JSON scalars (the reference
    * json.dumps model_version and macro_f1_score as numbers,
    * dag_functions.py:344–357) — bare tokens come back as their string
    * form. */
  def readJsonSidecar(path: String): Map[String, String] =
    parseFlatJson(new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8))

  @deprecated("sidecar reads are driver-side; use readJsonSidecar(path)", "r2")
  def readJsonSidecar(spark: SparkSession, path: String): Map[String, String] =
    readJsonSidecar(path)

  /** Sidecar write through the Hadoop filesystem of `path` — for
    * sidecars that must live NEXT TO Spark-written tables (e.g. the
    * near-dup store's `_meta.json`): with an hdfs:// or s3a:// store
    * root, driver-local java.nio would either throw or strand the meta
    * on the driver's disk while the tables land remotely. Still
    * driver-side O(1) I/O, just routed to the right filesystem. */
  def writeJsonSidecarFs(spark: SparkSession, path: String,
                         kv: Map[String, String]): Unit =
    writeBinarySidecarFs(spark, path,
      jsonBody(kv).getBytes(StandardCharsets.UTF_8))

  /** Binary sidecar through the store's own filesystem (same contract
    * as `writeJsonSidecarFs`: the whole store lives on ONE fs). Used
    * for serialized sketches that travel with a table — e.g. the exact
    * fp store's Bloom filter.
    *
    * Overwrites go through tmp + rename-with-OVERWRITE (the
    * `FileContext` rename, atomic on HDFS and posix local disks): a
    * bare `fs.create(p, true)` truncates in place, so a reader that
    * sized its buffer from `getFileStatus` just before a rewrite (the
    * `readBinarySidecarFs` pattern) could hit EOF or mixed old/new
    * bytes mid-read. With the rename, a concurrent reader sees the old
    * sidecar or the new one — never a torn one. Concurrent WRITERS of
    * the same sidecar still race on the shared tmp name; stores keep
    * their single-writer contract.
    *
    * Schemes WITHOUT an AbstractFileSystem binding (e.g. s3a unless
    * `fs.AbstractFileSystem.s3a.impl` is configured) have no
    * FileContext — there the write falls back to delete-then-rename
    * through the plain FileSystem API. That fallback is NOT atomic
    * (and object-store rename is a copy anyway): a reader racing the
    * overwrite can see the sidecar briefly absent, never torn bytes.
    * Atomic overwrite is an HDFS/local guarantee; elsewhere the store's
    * single-writer contract is what keeps the window harmless. */
  def writeBinarySidecarFs(spark: SparkSession, path: String,
                           bytes: Array[Byte]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    try {
      val fc = FileContext.getFileContext(fs.getUri,
        spark.sparkContext.hadoopConfiguration)
      fc.rename(fs.makeQualified(tmp), fs.makeQualified(p),
        Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (fs.exists(p)) fs.delete(p, false)
        require(fs.rename(tmp, p),
          s"sidecar overwrite: rename $tmp -> $p failed on " +
            s"${fs.getUri.getScheme} (non-FileContext fallback)")
    }
  }

  /** FS-routed binary sidecar read — see `writeBinarySidecarFs`.
    * Sized from the file status and `readFully`-filled rather than a
    * read-until-negative loop: `InputStream.read` may legally return 0
    * without EOF (some FS streams do under contention), and a `>= 0`
    * loop would spin forever on it; `readFully` loops internally until
    * the buffer is full or throws on premature EOF. */
  def readBinarySidecarFs(spark: SparkSession, path: String): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue,
      s"sidecar $path is $len bytes — past the byte-array ceiling")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    bytes
  }

  /** FS-routed twin of `readJsonSidecar` — see `writeJsonSidecarFs`. */
  def readJsonSidecarFs(spark: SparkSession, path: String): Map[String, String] =
    parseFlatJson(new String(readBinarySidecarFs(spark, path),
      StandardCharsets.UTF_8))

  private def parseFlatJson(s: String): Map[String, String] = {
    var i = 0
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      skipWs()
      require(i < s.length && s(i) == c, s"sidecar parse: expected '$c' at $i")
      i += 1
    }
    def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          require(i < s.length, "sidecar parse: truncated escape")
          s(i) match {
            case '"'  => sb += '"'
            case '\\' => sb += '\\'
            case '/'  => sb += '/'
            case 'n'  => sb += '\n'
            case 'r'  => sb += '\r'
            case 't'  => sb += '\t'
            case 'b'  => sb += '\b'
            case 'f'  => sb += '\f'
            case 'u'  =>
              require(i + 5 <= s.length, "sidecar parse: truncated \\u escape")
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case c => throw new IllegalArgumentException(s"sidecar parse: bad escape \\$c")
          }
          i += 1
        } else { sb += s(i); i += 1 }
      }
      require(i < s.length, "sidecar parse: unterminated string")
      i += 1
      sb.result()
    }
    // value position: quoted string, or a bare JSON scalar (number /
    // true / false / null) returned in its literal string form
    def parseValue(): String = {
      skipWs()
      require(i < s.length, "sidecar parse: missing value")
      if (s(i) == '"') parseString()
      else {
        val start = i
        while (i < s.length && s(i) != ',' && s(i) != '}' && !s(i).isWhitespace) i += 1
        require(i > start, s"sidecar parse: empty value at $start")
        s.substring(start, i)
      }
    }
    val out = Map.newBuilder[String, String]
    expect('{')
    skipWs()
    if (i < s.length && s(i) != '}') {
      var more = true
      while (more) {
        skipWs()
        val k = parseString()
        expect(':')
        out += k -> parseValue()
        skipWs()
        if (i < s.length && s(i) == ',') i += 1 else more = false
      }
    }
    expect('}')
    out.result()
  }

  // full JSON string escaping incl. ALL control chars — a raw newline or
  // tab in a value would make strict parsers (python json.load) reject
  // the sidecar
  private def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Small-file compaction — the maintenance pass every streaming/
    * incremental ingest needs at scale: micro-batch sinks and per-week
    * appends leave thousands of KB-sized files whose open/footer cost
    * dominates scans long before data volume does. Rewrites `srcDir`
    * into `dstDir` as ceil(totalBytes / targetFileBytes) files (≥ 1).
    *
    * Scale shape: the file census is a driver-side listing (metadata
    * only, no data read); the rewrite is one job — a shuffle-free
    * `coalesce` when SHRINKING the file count (the common small-file
    * case), a `repartition` shuffle when GROWING it (splitting
    * oversized files has to move rows; coalesce cannot raise the
    * partition count and would silently keep the old layout) —
    * content is bit-identical, only the file layout changes. Returns
    * the output file count. Deliberately writes to a NEW directory:
    * compact-in-place needs a commit protocol (write temp + atomic
    * swap) that belongs to the table format / orchestrator, not the
    * engine primitive — for a MANIFESTED table, [[compactPublished]]
    * is exactly that composition. */
  def compactParquet(spark: SparkSession, srcDir: String, dstDir: String,
                     targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val p = new Path(srcDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (totalBytes, nFiles) = parquetCensus(fs, p)
    require(nFiles > 0,
      s"compactParquet: no .parquet data files under $srcDir — refusing to " +
        "size the rewrite off an empty census")
    val nOut = targetFileCount(totalBytes, targetFileBytes)
    rewriteAs(spark.read.parquet(srcDir), nOut, dstDir)
    countParquetFiles(fs, new Path(dstDir))
  }

  /** RECURSIVE byte/file census of a parquet directory. Hive-partitioned
    * sources keep their data files under key=value subdirectories — a
    * flat listStatus would see 0 bytes there, collapse the rewrite to 1
    * file in silent violation of targetFileBytes. Hidden path
    * components (_temporary staging from a crashed write,
    * _spark_metadata, dot-files) are EXCLUDED exactly as spark.read
    * excludes them — counting them would size the rewrite off trash the
    * reader never sees.
    * Compares QUALIFIED paths: with a relative dir the raw root string
    * never matches the qualified paths listFiles returns, the walk
    * would climb past the table root, and a dot/underscore ancestor (a
    * .cache CWD, say) would mark every data file hidden. */
  private def parquetCensus(fs: FileSystem, root: Path): (Long, Int) = {
    val rootUri = fs.makeQualified(root).toUri.getPath
    def hiddenUnderRoot(f: Path): Boolean = {
      var cur = f
      while (cur != null && cur.toUri.getPath != rootUri) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return true
        cur = cur.getParent
      }
      false
    }
    val it = fs.listFiles(root, true)
    var totalBytes = 0L
    var nFiles = 0
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet") &&
          !hiddenUnderRoot(f.getPath)) {
        totalBytes += f.getLen; nFiles += 1
      }
    }
    (totalBytes, nFiles)
  }

  private def targetFileCount(totalBytes: Long, targetFileBytes: Long): Int =
    math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt

  /** One rewrite job: a shuffle-free `coalesce` when SHRINKING the file
    * count (the common small-file case), a `repartition` shuffle when
    * GROWING it (splitting oversized files has to move rows; coalesce
    * cannot raise the partition count and would silently keep the old
    * layout) — content is bit-identical, only the layout changes. */
  private def rewriteAs(df: DataFrame, nOut: Int, dstDir: String): Unit = {
    val cur = df.rdd.getNumPartitions
    val reshaped =
      if (nOut < cur) df.coalesce(nOut)
      else if (nOut > cur) df.repartition(nOut)
      else df
    reshaped.write.mode(SaveMode.Overwrite).parquet(dstDir)
  }

  private def countParquetFiles(fs: FileSystem, dir: Path): Int =
    fs.listStatus(dir).count(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))

  /** Z-value (Morton) interleave of per-column bucket ids: bit j of
    * column i lands at position j·k + (k−1−i), so all columns share the
    * high bits evenly and files that are contiguous in z cover a
    * near-square region of the bucket grid. Pure built-in bit ops —
    * k·bits shift/mask/or terms, fused by whole-stage codegen. */
  def zValue(buckets: Seq[Column], bitsPerCol: Int): Column = {
    val k = buckets.size
    val terms = for {
      (b, i) <- buckets.zipWithIndex
      j <- 0 until bitsPerCol
    } yield shiftleft(
      shiftrightunsigned(b.cast("long"), j).bitwiseAND(lit(1L)),
      j * k + (k - 1 - i))
    terms.reduce(_.bitwiseOR(_))
  }

  /** Z-order clustered rewrite — the data-layout half of multi-column
    * pruning at 100 TB. A dataset sorted by one column prunes scans on
    * that column only; interleaving the QUANTILE RANKS of k columns into
    * a z-value and range-partitioning on it gives every file a bounded
    * min/max range on EVERY z column (≈ N^(−1/k) of the domain per file
    * for N files), so parquet row-group/file stats prune predicates on
    * any of them. Same mechanism as lakehouse `OPTIMIZE ZORDER BY`,
    * built from public Spark pieces.
    *
    * Scale shape, one distributed pass each: (1) `approxQuantile`
    * (Greenwald–Khanna) collects 2^bits−1 cut points per column — the
    * driver holds a few KB of doubles, never data; (2) the z-value is a
    * codegen'd [[graft.functions.RangeBucket]] probe per column plus
    * bit-interleave arithmetic, map-side; (3) `repartitionByRange` on z
    * (reservoir sample + one shuffle) makes files contiguous z slabs;
    * `sortWithinPartitions` orders rows inside each file so row-group
    * stats prune within files too. Quantile ranks, not raw values: an
    * equi-WIDTH grid would collapse a skewed column into one cell and
    * z-order would degenerate to a sort on the other columns.
    *
    * Nulls rank below every cut point (bucket 0 via coalesce) — they
    * cluster into the low-z files instead of smearing everywhere.
    * Returns the output file count. New directory, same contract as
    * [[compactParquet]]: in-place swap is the table format's commit
    * protocol, not an engine primitive ([[zorderPublished]] for the
    * manifested composition). */
  def zorderWrite(spark: SparkSession, df: DataFrame, zCols: Seq[String],
                  dstDir: String, nFiles: Int, bitsPerCol: Int = 8,
                  relErr: Double = 0.002): Int = {
    require(zCols.size >= 2, "z-order needs ≥ 2 columns (1 is a plain sort)")
    require(zCols.size * bitsPerCol <= 62,
      s"${zCols.size} cols × $bitsPerCol bits overflows the long z-value")
    require(nFiles > 0, "nFiles must be positive")
    val nBuckets = 1 << bitsPerCol
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    // one pass for ALL columns' sketches; relErr 0.002 is half a bucket
    // at 8 bits — finer only sharpens bucket edges, not the layout
    val dbl = df.select(zCols.map(c => col(c).cast("double").as(c)): _*)
    val cuts = dbl.stat.approxQuantile(zCols.toArray, probs, relErr)
    val buckets = zCols.zip(cuts).map { case (c, bounds) =>
      coalesce(
        graft.plans.GraftFunctions.rangeBucket(
          spark, col(c).cast("double"), bounds),
        lit(0))
    }
    df.withColumn("_graft_z", zValue(buckets, bitsPerCol))
      .repartitionByRange(nFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
      .write.mode(SaveMode.Overwrite).parquet(dstDir)
    val d = new Path(dstDir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(d).count(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
  }

  /** S10 — directory-listing "catalog": discover week partitions by
    * directory-name prefix (weekly_evaluation.py:343–375 shape). */
  def listPartitions(spark: SparkSession, dir: String, prefix: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .sorted
  }

  /** S11 — file-existence gate (FileSensor shape). */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  // ── Manifest-committed publish ─────────────────────────────────────
  // The minimal transactional-table commit protocol (the pattern
  // Iceberg/Delta formalize), closing the one caveat the streaming
  // ingest loops document: a plain parquet `append` sink re-lands
  // replayed batches and exposes torn writes. Here data batch dirs land
  // FIRST under `$dir/data/batch=<id>`, and the table state is a
  // VERSIONED manifest (`_manifest.v<N>.json`, the live batch-id list)
  // renamed into place LAST — rename-to-fresh-name is the one
  // filesystem primitive that is atomic on HDFS, object-store
  // committers, and local disks alike. Readers resolve max-N and read
  // only listed batches, so every crash interleaving degrades to an
  // INVISIBLE orphan (batch dir without a manifest entry, or a torn
  // `.tmp` that no reader looks at), never a torn table; the replay of
  // the same batchId overwrites the same dir and commits the same
  // entry — idempotent end to end. SINGLE-WRITER contract (a
  // foreachBatch sink or one backfill job) — concurrent committers
  // would race the version number; that coordination belongs to a real
  // table format.

  private def manifestVersions(spark: SparkSession, dir: String)
      : Seq[(Int, Path)] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.map(_.getPath)
      .flatMap { p =>
        val m = "_manifest\\.v(\\d+)\\.json".r
        p.getName match {
          case m(v) => Some((v.toInt, p))
          case _ => None
        }
      }.sortBy(_._1)
  }

  /** Live batch ids of a manifested table (empty before first publish).
    * One retry on a vanished manifest: the writer GCs superseded
    * versions after committing a new one, so a reader that listed
    * max-N just before the GC can hit FileNotFound on the file it
    * resolved — re-listing finds the newer version. (The writer also
    * RETAINS version N-1 precisely so this window needs the file to
    * vanish across TWO commits before the retry can fail.) */
  def publishedBatches(spark: SparkSession, dir: String): Seq[Long] = {
    def resolve(): Seq[Long] =
      manifestVersions(spark, dir).lastOption.toSeq.flatMap { case (_, p) =>
        val s = readJsonSidecarFs(spark, p.toString)("batches")
        if (s.isEmpty) Seq.empty else s.split(",").map(_.toLong).toSeq
      }
    try resolve()
    catch {
      case _: java.io.FileNotFoundException =>
        try resolve()
        catch {
          // a SECOND vanish is not the GC race (the writer retains
          // N-1): the table dir itself is gone or being torn down —
          // report that, not a raw FNF on some internal path
          case e: java.io.FileNotFoundException =>
            throw new java.io.FileNotFoundException(
              s"$dir: manifest vanished twice — not a published table " +
                s"(deleted, or torn down mid-read)? underlying: ${e.getMessage}")
        }
    }
  }

  /** Commit a new manifest version listing exactly `batches` (tmp +
    * rename to a fresh name — the atomic primitive). Shared by
    * [[publishBatch]] (additive) and [[compactPublished]] /
    * [[zorderPublished]] (replacing). GC keeps the PREVIOUS version as
    * a grace copy for readers that resolved it just before this
    * commit; only versions older than N-1 are deleted. */
  private def commitManifest(spark: SparkSession, dir: String,
                             batches: Seq[Long]): Int = {
    val versions = manifestVersions(spark, dir)
    val next = versions.lastOption.map(_._1 + 1).getOrElse(1)
    val tmp = s"$dir/_manifest.v$next.json.tmp"
    writeJsonSidecarFs(spark, tmp,
      Map("batches" -> batches.sorted.mkString(",")))
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.rename(new Path(tmp), new Path(s"$dir/_manifest.v$next.json")),
      s"manifest commit raced: _manifest.v$next.json already exists " +
        "(second writer? the publish contract is single-writer)")
    versions.dropRight(1).foreach { case (_, p) => fs.delete(p, false) }
    next
  }

  /** Publish one batch atomically: data dir first, then the next
    * manifest version. Replay-idempotent under the single-writer
    * contract. */
  def publishBatch(df: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    df.write.mode("overwrite").parquet(s"$dir/data/batch=$batchId")
    val updated = (publishedBatches(spark, dir).toSet + batchId).toSeq.sorted
    commitManifest(spark, dir, updated)
  }

  /** Read the manifested table: only batches the latest manifest lists —
    * orphan dirs from crashed publishes are invisible. Fails loudly on a
    * never-published dir (no manifest ⇒ no table, not an empty one). */
  def readPublished(spark: SparkSession, dir: String): DataFrame = {
    val batches = publishedBatches(spark, dir)
    require(manifestVersions(spark, dir).nonEmpty,
      s"$dir has no manifest — not a published table")
    val paths = batches.map(b => s"$dir/data/batch=$b")
    require(paths.nonEmpty, s"$dir manifest lists no batches")
    spark.read.parquet(paths: _*)
  }

  /** Read ONE published batch's rows. Exists for replay paths that must
    * recover a batch's exact as-published content (e.g. a streaming
    * ingest loop re-deriving store rows for a batch whose publish
    * committed but whose checkpoint didn't): recomputing the batch from
    * its inputs is wrong there — the stores the computation reads have
    * already absorbed the batch. Fails loudly if the manifest no longer
    * lists the batch (compacted away / never published). */
  def readPublishedBatch(spark: SparkSession, dir: String,
                         batchId: Long): DataFrame = {
    require(publishedBatches(spark, dir).contains(batchId),
      s"$dir: batch $batchId is not in the live manifest")
    spark.read.parquet(s"$dir/data/batch=$batchId")
  }

  /** Shallow time travel: read the table as a SPECIFIC manifest version
    * saw it. Retention bounds the window — the writer keeps only the
    * current version and its N-1 grace copy, so this reaches exactly
    * one commit back (enough for the use it exists for: diffing a
    * maintenance flip or a suspect publish against the state just
    * before it, while both are still on disk). A version older than
    * the retention window fails loudly with what IS available; vacuum
    * respects the same two manifests, so a readable version's batch
    * dirs are still present ([[vacuumPublished]]). */
  def readPublishedVersion(spark: SparkSession, dir: String,
                           version: Int): DataFrame = {
    val versions = manifestVersions(spark, dir)
    require(versions.nonEmpty, s"$dir has no manifest — not a published table")
    val p = versions.collectFirst { case (v, p) if v == version => p }
      .getOrElse(throw new IllegalArgumentException(
        s"$dir: manifest v$version is outside the retention window " +
          s"(available: ${versions.map(_._1).mkString(", ")})"))
    val s = readJsonSidecarFs(spark, p.toString)("batches")
    val batches = if (s.isEmpty) Seq.empty[Long] else s.split(",").map(_.toLong).toSeq
    require(batches.nonEmpty, s"$dir manifest v$version lists no batches")
    spark.read.parquet(batches.map(b => s"$dir/data/batch=$b"): _*)
  }

  /** Floor of the MAINTENANCE id range. Ingest writers key batches by
    * their own counter (a stream's checkpointed batchId + 1), so a
    * maintenance rewrite must never elect an id that counter will
    * reach: `max(landed) + 1` is EXACTLY the stream's next id, and the
    * very next micro-batch would overwrite the compacted dir and
    * commit a manifest pointing at it — the whole corpus silently
    * replaced by one batch. Maintenance ids therefore live in their
    * own range, 10^12 up (a per-millisecond stream needs ~31 years to
    * reach it); the batch-id namespace contract gains one rule: ingest
    * lineages stay below it. */
  private[sources] val maintenanceIdBase = 1000000000000L

  /** First free MAINTENANCE id: above [[maintenanceIdBase]] and above
    * every id that has EVER landed under `$dir/data` — live, orphaned,
    * or crash residue alike. Scanning the directory (not just the
    * manifest) matters: a crashed-but-replayable publish leaves an
    * unlisted dir whose id its writer WILL commit later; electing that
    * id would let the replay overwrite the rewritten data and then
    * commit a manifest pointing at it — silent data loss. Dir names
    * outside the `batch=<long>` shape are ignored (they are not the
    * table's). */
  private def nextBatchId(fs: FileSystem, dir: String): Long = {
    val data = new Path(s"$dir/data")
    val m = "batch=(\\d+)".r
    val seen =
      if (!fs.exists(data)) Seq.empty[Long]
      else fs.listStatus(data).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName).collect { case m(id) => id.toLong }
    math.max(seen.foldLeft(0L)(math.max) + 1, maintenanceIdBase)
  }

  /** Maintenance under the manifest — small-file compaction of a
    * PUBLISHED table as one transactional commit: the live batches'
    * rows are rewritten into a SINGLE new batch dir sized by
    * `targetFileBytes` ([[compactParquet]]'s census + coalesce/
    * repartition shape), then ONE new manifest version lists exactly
    * that batch. Readers atomically flip from the fragmented layout to
    * the compacted one; the old batch dirs become invisible orphans
    * (GC'able at leisure), and a crash at ANY point degrades to an
    * invisible orphan of the new dir — rerun to converge. This is the
    * loop `OPTIMIZE` closes in lakehouse formats, composed from this
    * file's own primitives. SINGLE-WRITER like every manifest
    * operation: the compactor takes the writer role for the commit
    * (coordinate with the ingest loop — e.g. between micro-batches).
    * Returns (new batch id, output file count). */
  def compactPublished(spark: SparkSession, dir: String,
                       targetFileBytes: Long = 128L << 20): (Long, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val live = publishedBatches(spark, dir)
    require(live.nonEmpty,
      s"compactPublished: $dir has no live batches (never published, " +
        "or manifest lists none)")
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val censuses = live.map(b => parquetCensus(fs, new Path(s"$dir/data/batch=$b")))
    val totalBytes = censuses.map(_._1).sum
    require(censuses.map(_._2).sum > 0,
      s"compactPublished: live batches of $dir hold no .parquet files")
    val nOut = targetFileCount(totalBytes, targetFileBytes)
    val newId = nextBatchId(fs, dir)
    val dst = s"$dir/data/batch=$newId"
    rewriteAs(spark.read.parquet(live.map(b => s"$dir/data/batch=$b"): _*),
      nOut, dst)
    commitManifest(spark, dir, Seq(newId))
    (newId, countParquetFiles(fs, new Path(dst)))
  }

  /** Z-order clustering of a PUBLISHED table under the same
    * one-commit contract as [[compactPublished]]: the live batches are
    * rewritten through [[zorderWrite]] into one new batch dir, then a
    * single manifest version flips the table to the clustered layout.
    * Returns (new batch id, output file count). */
  def zorderPublished(spark: SparkSession, dir: String, zCols: Seq[String],
                      nFiles: Int, bitsPerCol: Int = 8,
                      relErr: Double = 0.002): (Long, Int) = {
    val live = publishedBatches(spark, dir)
    require(live.nonEmpty,
      s"zorderPublished: $dir has no live batches (never published, " +
        "or manifest lists none)")
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val newId = nextBatchId(fs, dir)
    val dst = s"$dir/data/batch=$newId"
    val n = zorderWrite(spark,
      spark.read.parquet(live.map(b => s"$dir/data/batch=$b"): _*),
      zCols, dst, nFiles, bitsPerCol, relErr)
    commitManifest(spark, dir, Seq(newId))
    (newId, n)
  }

  /** GC the orphans a manifested table accumulates — crash residue from
    * torn publishes and the pre-rewrite batch dirs [[compactPublished]]
    * / [[zorderPublished]] leave behind: delete every `batch=<id>` dir
    * under `$dir/data` that neither the CURRENT manifest nor the
    * retained N-1 grace manifest references. Honoring the grace copy is
    * load-bearing, not politeness: a reader that resolved version N-1
    * just before a commit is still scanning those batch dirs — deleting
    * them would fail a read the manifest protocol promised could
    * succeed. (The same reader-vs-GC window the manifest's own
    * retention rule exists for; see [[publishedBatches]].) Dirs outside
    * the `batch=<long>` shape are left alone — they are not the
    * table's to delete. Same single-writer coordination as every
    * manifest operation. Returns the deleted batch ids. */
  def vacuumPublished(spark: SparkSession, dir: String): Seq[Long] = {
    val versions = manifestVersions(spark, dir)
    require(versions.nonEmpty,
      s"vacuumPublished: $dir has no manifest — not a published table")
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val referenced = versions.takeRight(2).flatMap { case (_, p) =>
      val s = readJsonSidecarFs(spark, p.toString)("batches")
      if (s.isEmpty) Seq.empty else s.split(",").map(_.toLong).toSeq
    }.toSet
    val data = new Path(s"$dir/data")
    val m = "batch=(\\d+)".r
    val landed =
      if (!fs.exists(data)) Seq.empty[Long]
      else fs.listStatus(data).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName).collect { case m(id) => id.toLong }
    val orphans = landed.filterNot(referenced).sorted
    orphans.foreach(b => fs.delete(new Path(s"$dir/data/batch=$b"), true))
    orphans
  }
}

/** S7/S8 — metrics store behind a trait: parquet implementation for
  * tests/local, JDBC for a real warehouse (same contract;
  * model_inference_utils.py:103–136).
  */
trait MetricsStore {
  def append(metrics: DataFrame): Unit
  def read(spark: SparkSession): DataFrame
}

final class ParquetMetricsStore(path: String) extends MetricsStore {
  def append(metrics: DataFrame): Unit =
    metrics.write.mode(SaveMode.Append).parquet(path)
  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** JDBC-backed store (model_inference_utils.py:103–136 shape). Executed
  * in tests against embedded Derby (the in-process JDBC engine Spark
  * ships for its Hive metastore): append creates the table on first
  * write. Derby maps StringType to CLOB, which can't be compared or
  * pushed a filter — pass `createTableColumnTypes` in `props` (it is
  * merged into the writer options) to pin VARCHAR types for key columns.
  *
  * JSONB-shaped map columns (the reference stores `f1_by_grade` and
  * `predictions_distribution` as Postgres JSONB,
  * model_inference_utils.py:114–115): RDBMSes have no MAP type, so
  * MapType columns are serialized to JSON strings on append and restored
  * with `read(spark, mapCols)` on the way back. */
final class JdbcMetricsStore(url: String, table: String,
                             props: java.util.Properties) extends MetricsStore {
  def append(metrics: DataFrame): Unit = {
    val flat = metrics.schema.fields.foldLeft(metrics) {
      case (df, f) if f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] =>
        df.withColumn(f.name, to_json(col(f.name)))
      case (df, _) => df
    }
    flat.write.mode(SaveMode.Append).jdbc(url, table, props)
  }
  def read(spark: SparkSession): DataFrame = spark.read.jdbc(url, table, props)
  /** Read with the named JSON-string columns decoded back to maps. */
  def read(spark: SparkSession,
           mapCols: Map[String, org.apache.spark.sql.types.MapType]): DataFrame =
    mapCols.foldLeft(read(spark)) { case (df, (name, t)) =>
      df.withColumn(name, from_json(col(name), t))
    }
}
