package graft.operators

import graft.SparkSpec
import graft.core.Tables
import graft.ops.ColumnOps
import org.apache.spark.sql.functions._

class IvfReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("ivfTopK probes cells and overlaps brute-force top-k") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(e, q, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(e, q, 5, nCells = 8, nProbe = 4)
    val approx = ivf.select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(ivf.groupBy("q_id").count().filter($"count" =!= 5).count() == 0,
      "every query returns k rows")
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"ivf recall $recall below floor")
    // determinism: same seed, same result
    val again = Similarity.ivfTopK(e, q, 5, nCells = 8, nProbe = 4)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(again == approx)
  }

  test("at-rest IVF index: pruned scan, same answers as the in-memory path") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 3)
    val path = java.nio.file.Files.createTempDirectory("ivf").toString + "/index"
    val centroids = Similarity.writeIvfIndex(e, path, nCells = 8)
    val fromIndex = Similarity.ivfTopKFromIndex(path, centroids, q, 5, nProbe = 2)
    val inMemory = Similarity.ivfTopK(e, q, 5, nCells = 8, nProbe = 2)
    assert(fromIndex.collect().toSet == inMemory.collect().toSet,
      "index path must reproduce the in-memory quantizer's answers")
    // the probe filter reaches the scan as partition pruning, and fewer
    // partition dirs than nCells are actually read
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected cell partition pruning in:\n$plan")
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: QueryStageExec => scans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val prunedFiles = scans(fromIndex.queryExecution.executedPlan)
      .map(_.selectedPartitions.partitionCount).headOption
    assert(prunedFiles.exists(n => n > 0 && n < 8),
      s"probes should read a strict subset of the 8 cells, got $prunedFiles")
  }

  test("IVF grow path: append covers the batch, replay overwrites, centroids round-trip") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 3)
    val path = java.nio.file.Files.createTempDirectory("ivfg").toString + "/index"
    val base = e.filter($"vec_id" % 5 =!= 0)
    val batch = e.filter($"vec_id" % 5 === 0)
    val centroids = Similarity.writeIvfIndex(base, path, nCells = 8)
    // centroids are self-contained in the index
    val loaded = Similarity.loadIvfCentroids(spark, path)
    assert(loaded.map(_._1) == centroids.map(_._1) &&
      loaded.zip(centroids).forall { case ((_, a), (_, b)) => a.sameElements(b) },
      "loadIvfCentroids must round-trip writeIvfIndex's return")
    Similarity.appendToIvfIndex(batch, path, batchId = 1L)
    val ids = spark.read.parquet(s"$path/cells").select("n_id")
      .as[Long].collect().toSet
    val expected = e.select("vec_id").as[Long].collect().toSet
    assert(ids == expected, "grown index must cover base ∪ batch")
    // IDEMPOTENCE: replaying the batch under its batchId overwrites
    val before = spark.read.parquet(s"$path/cells").count()
    Similarity.appendToIvfIndex(batch, path, batchId = 1L)
    assert(spark.read.parquet(s"$path/cells").count() == before,
      "replayed batchId must overwrite, not grow")
    // searches over the grown index see appended vectors as neighbors
    val grown = Similarity.ivfTopKFromIndex(path, centroids, q, 5, nProbe = 4)
    assert(grown.groupBy("q_id").count().filter($"count" =!= 5).count() == 0)
    val appendedSeen = grown.join(batch.select($"vec_id".as("n_id")), "n_id")
    assert(appendedSeen.count() > 0,
      "appended vectors must be reachable through probed-cell scoring")
  }

  test("ivfCellStats + shouldRebuildIvf: drift monitor flips on a skewed append") {
    val e = Tables.embeddings(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("ivfd").toString + "/index"
    Similarity.writeIvfIndex(e, path, nCells = 8)
    def statsRow() = {
      val r = Similarity.ivfCellStats(spark, path).first()
      (r.getAs[Long]("n_keys"), r.getAs[Long]("n_rows"),
        r.getAs[Double]("skew_ratio"))
    }
    val (cells0, rows0, skew0) = statsRow()
    assert(rows0 == e.count(), "stats must census every landed vector")
    assert(cells0 == 8L, "k-means on this corpus populates every cell")
    assert(!Similarity.shouldRebuildIvf(8, cells0, skew0, maxSkewRatio = 4.0),
      s"fresh index must not flag a rebuild (skew $skew0)")
    // a pathological append: a tight BLOB around one base vector —
    // nearest-existing-centroid assignment piles it all into one cell,
    // exactly the drift the policy watches (spread inside the blob so
    // a REBUILD's fresh k-means can split it, which the append rule
    // structurally cannot)
    // a pathological append: the SAME vector replicated — every copy
    // lands in one nearest cell, exactly the drift the policy watches
    val one = e.limit(1).select($"embedding").as[Array[Float]].head()
    val skewBatch = (0 until 2000)
      .map(i => (1000000L + i, one)).toDF("vec_id", "embedding")
    Similarity.appendToIvfIndex(skewBatch, path, batchId = 1L)
    val (cells1, rows1, skew1) = statsRow()
    assert(rows1 == rows0 + 2000)
    assert(skew1 > skew0, "hot-cell append must raise the skew ratio")
    assert(Similarity.shouldRebuildIvf(8, cells1, skew1, maxSkewRatio = 4.0),
      s"post-append skew $skew1 must trip the 4x rule")
    // the dead-cell arm: fewer non-empty cells than the quantizer has
    assert(Similarity.shouldRebuildIvf(8, 7L, 1.0))
    assert(!Similarity.shouldRebuildIvf(8, 8L, 1.0))
  }

  test("rebuildIvfIndex re-balances what append-assignment cannot") {
    // 8 tight, well-separated clusters on axes (50·e_d, jitter ±0.1).
    // The base install quantizes on clusters 0–1 only; clusters 2–7
    // then APPEND — nearest-existing-centroid assignment has only the
    // old centroids to offer, so the appended mass piles into few hot
    // cells. A rebuild re-fits the quantizer on the full population
    // and recovers the textbook one-centroid-per-cluster layout.
    val rnd = new scala.util.Random(7)
    def cluster(d: Int, base: Long) = (0 until 250).map { i =>
      val v = Array.fill(16)((rnd.nextFloat() - 0.5f) * 0.2f)
      v(d) += 50f
      (base + i, v)
    }
    val baseDf = (0 until 2).flatMap(d => cluster(d, d * 1000L))
      .toDF("vec_id", "embedding")
    val appendDf = (2 until 8).flatMap(d => cluster(d, d * 1000L))
      .toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("ivfr").toString + "/index"
    Similarity.writeIvfIndex(baseDf, path, nCells = 8)
    Similarity.appendToIvfIndex(appendDf, path, batchId = 1L)
    def skewOf(p: String) = {
      val r = Similarity.ivfCellStats(spark, p).first()
      (r.getAs[Long]("n_keys"), r.getAs[Long]("n_rows"),
        r.getAs[Double]("skew_ratio"))
    }
    val (cells1, rows1, skew1) = skewOf(path)
    assert(rows1 == 2000L)
    // threshold is POLICY: at a 2x straggler SLO the drifted index
    // (measured skew 2.47 — appended clusters concentrate on the few
    // old centroids nearest them) trips the rule
    assert(Similarity.shouldRebuildIvf(8, cells1, skew1, maxSkewRatio = 2.0),
      s"appended 6 unseen clusters must trip the monitor (skew $skew1, cells $cells1)")
    val dst = path + "_rebuilt"
    Similarity.rebuildIvfIndex(spark, path, dst, nCells = 8)
    val (cellsR, rowsR, skewR) = skewOf(dst)
    assert(rowsR == rows1, "rebuild must carry every landed vector")
    assert(skewR < skew1,
      s"rebuild must improve balance (was $skew1, now $skewR)")
    assert(!Similarity.shouldRebuildIvf(8, cellsR, skewR, maxSkewRatio = 2.0),
      s"rebuilt index must read healthy at the same SLO (skew $skewR, cells $cellsR)")
  }

  test("rebuildIvfIndex side-by-side guard sees through path aliases") {
    // the r17 require compared raw unqualified URIs, so a relative
    // path, a file:// scheme, or a symlink of the SAME directory walked
    // past it — and writeIvfIndex's reinstall clear then deleted the
    // source cells before the k-means fit read them (irrecoverable loss
    // before the first error). The guard must canonicalize both sides.
    val root = java.nio.file.Files.createTempDirectory("ivfalias")
    val path = root.toString + "/index"
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.fill(8)(i.toFloat))).toDF("vec_id", "embedding")
    Similarity.writeIvfIndex(vecs, path, nCells = 2)
    val rowsBefore = spark.read.parquet(s"$path/cells").count()
    // alias 1: explicit file: scheme on the same dir
    val e1 = intercept[IllegalArgumentException] {
      Similarity.rebuildIvfIndex(spark, path, "file:" + path, nCells = 2)
    }
    assert(e1.getMessage.contains("SIDE BY SIDE"))
    // alias 2: a dot-segment alias of the same dir
    val e2 = intercept[IllegalArgumentException] {
      Similarity.rebuildIvfIndex(spark, path,
        root.toString + "/./index", nCells = 2)
    }
    assert(e2.getMessage.contains("SIDE BY SIDE"))
    // alias 3: a SYMLINK to the same dir
    val link = java.nio.file.Paths.get(root.toString, "alias")
    java.nio.file.Files.createSymbolicLink(link,
      java.nio.file.Paths.get(path))
    val e3 = intercept[IllegalArgumentException] {
      Similarity.rebuildIvfIndex(spark, path, link.toString, nCells = 2)
    }
    assert(e3.getMessage.contains("SIDE BY SIDE"))
    // the store survived every refused alias
    assert(spark.read.parquet(s"$path/cells").count() == rowsBefore,
      "refused rebuilds must leave the source index untouched")
    // and an honest side-by-side rebuild still works
    Similarity.rebuildIvfIndex(spark, path, path + "_v2", nCells = 2)
    assert(spark.read.parquet(s"$path/cells").count() == rowsBefore)
    assert(spark.read.parquet(s"${path}_v2/cells").count() == rowsBefore)
  }

  test("reconcileFeatures injects missing features as 0, drops extras, orders") {
    val contract = Seq("f1", "f2", "f3")
    val batch = Seq((1L, 0.5, 9.9)).toDF("id", "f2", "junk")
    val out = ColumnOps.reconcileFeatures(batch, contract)
    assert(out.columns.toSeq == Seq("id", "f1", "f2", "f3"))
    val r = out.first()
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.5 && r.getDouble(3) == 0.0)
  }
}
