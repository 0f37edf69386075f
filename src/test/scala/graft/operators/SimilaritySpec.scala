package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identical vectors score 1, orthogonal score 0") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 2.0f))).toDF("a", "b")
    val out = df.select(Similarity.cosine($"a", $"b").as("c")).as[Double].collect()
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(math.abs(out(1)) < 1e-12)
  }

  test("bruteForceTopK returns k ranked neighbors per query, descending") {
    val e = Tables.embeddings(spark, sf)
    val out = Similarity.bruteForceTopK(e, e.filter($"vec_id" < 3), 4).collect()
    assert(out.length == 12)
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      val coss = sorted.map(_.getAs[Double]("cos_sim"))
      assert(coss.zip(coss.tail).forall { case (x, y) => x >= y })
      assert(rows.forall(r => r.getAs[Long]("n_id") != r.getAs[Long]("q_id")))
    }
  }

  test("lshTopK: bounded-join approximate path overlaps brute force") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(e, q, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(e, q, 5, dim = 64)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    // random corpus has no planted neighbors; LSH recall is honest-but-low
    assert(recall >= 0.15, s"lsh recall $recall below floor")
  }

  test("hybridRerank: metadata score reorders candidates, alpha bounds hold") {
    // candidate frame as any generator emits it: q 100 has three
    // candidates whose cosine order is 1 > 2 > 3, but doc 3's score is
    // high enough that the 0.5-blend flips it to the top
    val cand = Seq(
      (100L, 1, 1L, 0.90), (100L, 2, 2L, 0.85), (100L, 3, 3L, 0.80))
      .toDF("q_id", "rank", "n_id", "cos_sim")
    val scores = Seq((1L, 0.10), (2L, 0.20), (3L, 0.90)).toDF("id", "s")
    val out = Similarity.hybridRerank(cand, scores, k = 2, alpha = 0.5,
        idCol = "id", scoreCol = "s")
      .select("q_id", "rank", "n_id", "combined")
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    // combined: doc1 0.5, doc2 0.525, doc3 0.85
    assert(out.toSeq == Seq(
      (100L, 1, 3L, 0.85), (100L, 2, 2L, 0.525)))
    // alpha = 1 degenerates to pure cosine order
    val pure = Similarity.hybridRerank(cand, scores, 3, 1.0, "id", "s")
      .orderBy("rank").select("n_id").as[Long].collect().toSeq
    assert(pure == Seq(1L, 2L, 3L))
  }

  test("pqEncode: one row per vector, codes in range, deterministic") {
    val e = Tables.embeddings(spark, sf)
    val cb = Similarity.trainPq(e, dim = 64, m = 8, k = 16)
    assert(cb.centroids.length == 8 &&
      cb.centroids.forall(_.length == 16) &&
      cb.centroids.forall(_.forall(_.length == 8)))
    val enc = Similarity.pqEncode(e, cb)
    val rows = enc.collect()
    assert(rows.length == e.count())
    rows.foreach { r =>
      val code = r.getAs[scala.collection.Seq[Int]]("code")
      assert(code.length == 8 && code.forall(c => c >= 0 && c < 16))
      assert(r.getAs[Double]("recon_norm") >= 0.0)
    }
    // same codebooks → byte-identical encoding (seeded k-means, argmin
    // with a first-match tie rule)
    val again = Similarity.pqEncode(e, cb).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("pq on an exactly-quantizable fixture reproduces brute force") {
    // every subvector is one of 4 patterns, k = 4 ⇒ k-means recovers the
    // patterns exactly, reconstruction is lossless, and ADC cosine IS
    // exact cosine — pqTopK must equal bruteForceTopK row for row
    val patterns = Seq(
      Array(1.0f, 0.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f, 0.0f),
      Array(0.0f, 0.0f, 1.0f, 0.0f), Array(0.0f, 0.0f, 0.0f, 1.0f))
    val vecs = (0 until 40).map { i =>
      (i.toLong, (patterns(i % 4) ++ patterns((i / 4) % 4)).toArray)
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 3)
    val cb = Similarity.trainPq(vecs, dim = 8, m = 2, k = 4)
    val pq = Similarity.pqTopK(Similarity.pqEncode(vecs, cb), cb, q, 5)
      .collect().map(_.toString).sorted.toSeq
    val bf = Similarity.bruteForceTopK(vecs, q, 5)
      .collect().map(_.toString).sorted.toSeq
    assert(pq == bf)
  }

  test("pq store: layout round-trips, store path ≡ live path, appends grow idempotently") {
    val dir = java.nio.file.Files.createTempDirectory("pq_store").toString
    val e = Tables.embeddings(spark, sf)
    val base = e.filter($"vec_id" % 5 =!= 0)   // 80% install
    val extra = e.filter($"vec_id" % 5 === 0)  // 20% appended
    val q = e.filter($"vec_id" < 5)
    val cb = Similarity.writePqIndex(base, dir, dim = 64, m = 8, k = 16)
    // codebooks round-trip bit-exactly through parquet + meta sidecar
    val loaded = Similarity.loadPqCodebooks(spark, dir)
    assert(loaded.m == cb.m && loaded.k == cb.k && loaded.subDim == cb.subDim)
    (0 until cb.m).foreach { j => (0 until cb.k).foreach { c =>
      assert(loaded.centroids(j)(c).sameElements(cb.centroids(j)(c)))
      assert(loaded.norm2(j)(c) == cb.norm2(j)(c))
    }}
    // store path answers ≡ live path answers over the same population
    val live = Similarity.pqTopKReranked(
        Similarity.pqEncode(base, cb), cb, q, base, 5, depth = 30)
      .collect().map(_.toString).sorted.toSeq
    val stored = Similarity.pqTopKFromIndex(dir, q, base, 5, depth = 30)
      .collect().map(_.toString).sorted.toSeq
    assert(live == stored)
    // grow: appended codes land keyed by batch, replay converges
    Similarity.appendToPqIndex(extra, dir, batchId = 1L)
    Similarity.appendToPqIndex(extra, dir, batchId = 1L) // replay
    val n = spark.read.parquet(s"$dir/codes").count()
    assert(n == e.count(), s"store rows $n after replayed append")
    // grown store scores the appended vectors too
    val grown = Similarity.pqTopKFromIndex(dir, q, e, 5, depth = 30)
    assert(grown.count() == 25)
  }

  test("ivfPqTopK: lossless fixture with all cells probed reproduces brute force") {
    // 8 distinct vectors (4 subvector patterns per subspace × 2 cells'
    // residual offsets ⇒ ≤ 8 distinct residuals per subspace); with
    // kCodes = 8 the codebooks recover them exactly, reconstruction is
    // lossless, and probing BOTH cells leaves no routing loss — the
    // ADC ranking (then exact re-rank) must reproduce brute force
    val patterns = Seq(
      Array(1.0f, 0.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f, 0.0f),
      Array(0.0f, 0.0f, 1.0f, 0.0f), Array(0.0f, 0.0f, 0.0f, 1.0f))
    val vecs = (0 until 40).map { i =>
      (i.toLong, (patterns(i % 4) ++ patterns((i / 4) % 4)).toArray)
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 3)
    val got = Similarity.ivfPqTopK(vecs, q, 5, nCells = 2, nProbe = 2,
        m = 2, kCodes = 8, depth = 40)
      .collect().map(_.toString).sorted.toSeq
    val bf = Similarity.bruteForceTopK(vecs, q, 5)
      .collect().map(_.toString).sorted.toSeq
    assert(got == bf)
  }

  test("ivfPqTopK: probed-cell search clears the recall floor, replays identically") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(e, q, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val a = Similarity.ivfPqTopK(e, q, 5)
    val rows = a.collect().map(_.toString).sorted.toSeq
    val got = a.select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (got & exact).size.toDouble / exact.size
    // floor = measured-minus-margin (RecallProbe table, NOTES r13:
    // ivfpq nProbe=4/cells=8 at sf0.001 = 0.74; seeded fits replay
    // bit-identically, so a codebook regression halving recall FAILS
    // here instead of hiding under a 0.3 floor)
    assert(recall >= 0.65, s"ivfpq recall $recall below floor")
    // seeded quantizer + codebooks over the SAME input frame ⇒
    // replay-identical (k-means|| init samples per partition, so
    // LAYOUT invariance is not promised — same contract as ann3)
    val again = Similarity.ivfPqTopK(e, q, 5)
      .collect().map(_.toString).sorted.toSeq
    assert(rows == again)
  }

  test("pqTopKReranked: exact re-rank recovers recall ADC alone loses") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 10)
    val cb = Similarity.trainPq(e, dim = 64, m = 8, k = 16)
    val enc = Similarity.pqEncode(e, cb)
    val exact = Similarity.bruteForceTopK(e, q, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "n_id").as[(Long, Long)].collect().toSet
      (got & exact).size.toDouble / exact.size
    }
    val adc = recall(Similarity.pqTopK(enc, cb, q, 5))
    val rr = recall(Similarity.pqTopKReranked(enc, cb, q, e, 5, depth = 50))
    assert(rr >= adc, s"re-rank recall $rr below raw ADC $adc")
    // floor = measured-minus-margin (NOTES r13 table: m8k16 rerank
    // d=50 at sf0.001 = 0.72; deterministic fits ⇒ tight floor)
    assert(rr >= 0.6, s"re-rank recall $rr below floor")
    // re-ranked cos_sim is EXACT cosine: every (q, n, sim) row must
    // agree with the brute-force similarity for the same pair
    val bfSim = Similarity.bruteForceTopK(e, q, 50)
      .select("q_id", "n_id", "cos_sim").as[(Long, Long, Double)]
      .collect().map { case (a, b, s) => (a, b) -> s }.toMap
    Similarity.pqTopKReranked(enc, cb, q, e, 5, depth = 50)
      .select("q_id", "n_id", "cos_sim").as[(Long, Long, Double)]
      .collect().foreach { case (a, b, s) =>
        bfSim.get((a, b)).foreach(exp => assert(math.abs(exp - s) < 1e-9))
      }
  }

  test("trainPq sample is a seeded hash draw: row-order independent, deterministic") {
    val e = Tables.embeddings(spark, sf)
    // sampleCap below the corpus size so the draw actually selects —
    // a bare limit() here would change codebooks under reordering
    val cap = (e.count() / 2).toInt.max(8)
    def cents(c: org.apache.spark.sql.DataFrame): Seq[Seq[Seq[Float]]] =
      Similarity.trainPq(c, dim = 64, m = 4, k = 4, sampleCap = cap)
        .centroids.toSeq.map(_.toSeq.map(_.toSeq))
    val a = cents(e)
    assert(a == cents(e), "same corpus must train identical codebooks")
    // reverse the scan order: a hash-rank draw picks the same VALUE
    // set, so the codebooks are identical; limit() would not survive
    assert(a == cents(e.orderBy(desc("vec_id"))),
      "codebooks must not depend on row order (head-of-scan bias)")
    assert(a == cents(e.repartition(7)),
      "codebooks must not depend on partitioning")
    // degenerate input fails loudly, not with NoSuchElementException
    val err = intercept[IllegalArgumentException] {
      Similarity.trainPq(e.filter(lit(false)), dim = 64, m = 4, k = 4)
    }
    assert(err.getMessage.contains("empty"))
  }

  test("IVF tombstones + incremental re-embed serve exactly the new snapshot") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfinc").toString
    val path = s"$tmp/idx"
    // deterministic per-text embedding: changed text ⇒ changed vector
    def embed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), transform(sequence(lit(0), lit(7)),
        i => (pmod(xxhash64(concat(col("text"), i)), lit(97)) / lit(97.0))
          .cast("float")).as("embedding"))
    val oldSnap = (1L to 40L).map(i => (i, s"document number $i body"))
      .toDF("doc_id", "text")
    val newSnap = (3L to 44L).map(i =>
        (i, if (i % 5 == 0) s"document number $i EDITED" else s"document number $i body"))
      .toDF("doc_id", "text")
    Similarity.writeIvfIndex(embed(oldSnap), path, nCells = 4,
      idCol = "doc_id")
    Similarity.incrementalReembedIvf(oldSnap, newSnap, embed, path,
      batchId = 1L, idCol = "doc_id", textCol = "text")
    // live rows = exactly the new snapshot's vectors: removed ids gone,
    // changed ids carry the NEW vector, same ids the old (identical)
    val tombs = spark.read.parquet(s"$path/tombstones")
      .select("n_id", "batch").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val raw = spark.read.parquet(s"$path/cells")
      .select("n_id", "n_vec", "batch").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val live = raw.filter { case (id, _, b) =>
      !tombs.exists { case (tid, tb) => tid == id && tb > b } }
      .map { case (id, v, _) => id -> v }.toMap
    val want = embed(newSnap).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(live == want,
      "live index rows must equal the new snapshot's vectors exactly")
    // the served reader agrees: no removed id is ever returned, and a
    // changed doc matches its NEW vector as its own nearest neighbor
    val cents = Similarity.loadIvfCentroids(spark, path)
    val served = Similarity.ivfTopKFromIndex(path, cents,
        embed(newSnap).withColumnRenamed("doc_id", "vec_id"),
        k = 3, nProbe = 4, idCol = "vec_id")
    val servedIds = served.select("n_id").as[Long].collect().toSet
    assert(!servedIds.contains(1L) && !servedIds.contains(2L),
      "tombstoned (removed) ids must never serve")
    // replay: same batchId, same inputs — idempotent, nothing doubles
    Similarity.incrementalReembedIvf(oldSnap, newSnap, embed, path,
      batchId = 1L, idCol = "doc_id", textCol = "text")
    val live2 = spark.read.parquet(s"$path/cells")
      .select("n_id", "n_vec", "batch").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
      .filter { case (id, _, b) =>
        !tombs.exists { case (tid, tb) => tid == id && tb > b } }
      .map { case (id, v, _) => id -> v }.toMap
    assert(live2 == want, "replayed maintenance must converge")
    // a rebuild compacts the deletes away: fresh index, no tombstones,
    // same live set
    val dst = s"$tmp/idx2"
    Similarity.rebuildIvfIndex(spark, path, dst, nCells = 4,
      idCol = "doc_id", vecCol = "embedding")
    val rebuilt = spark.read.parquet(s"$dst/cells")
      .select("n_id", "n_vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rebuilt == want, "rebuild must carry exactly the live rows")
    assert(!new java.io.File(s"$dst/tombstones").exists,
      "a rebuilt index starts with no tombstones")
  }

  test("PQ store tombstones: live codes track the new snapshot, dead codes never ADC") {
    val tmp = java.nio.file.Files.createTempDirectory("pqinc").toString
    val path = s"$tmp/idx"
    def embed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), transform(sequence(lit(0), lit(7)),
        i => (pmod(xxhash64(concat(col("text"), i)), lit(97)) / lit(97.0))
          .cast("float")).as("embedding"))
    val oldSnap = (1L to 40L).map(i => (i, s"pq document $i body"))
      .toDF("doc_id", "text")
    val newSnap = (3L to 44L).map(i =>
        (i, if (i % 5 == 0) s"pq document $i EDITED" else s"pq document $i body"))
      .toDF("doc_id", "text")
    val cb = Similarity.writePqIndex(embed(oldSnap), path, dim = 8,
      m = 4, k = 8, idCol = "doc_id")
    Similarity.incrementalReembedPq(oldSnap, newSnap, embed, path,
      batchId = 1L, idCol = "doc_id", textCol = "text")
    // live codes = exactly the new snapshot encoded against the STORED
    // codebooks (appendToPqIndex's rule — no refit on append)
    val tombs = spark.read.parquet(s"$path/tombstones")
      .select("n_id", "batch").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val live = spark.read.parquet(s"$path/codes")
      .select("n_id", "code", "batch").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2)))
      .filter { case (id, _, b) =>
        !tombs.exists { case (tid, tb) => tid == id && tb > b } }
      .map { case (id, c, _) => id -> c }.toMap
    val want = Similarity.pqEncode(embed(newSnap), cb, idCol = "doc_id")
      .select("n_id", "code").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(live == want,
      "live PQ codes must equal the new snapshot's encoding exactly")
    // the served reader agrees: removed ids never score, even in ADC
    val served = Similarity.pqTopKFromIndex(path,
      embed(newSnap.limit(5)).withColumnRenamed("doc_id", "vec_id"),
      embed(newSnap).withColumnRenamed("doc_id", "vec_id"),
      k = 40, depth = 0)
    val servedIds = served.select("n_id").as[Long].collect().toSet
    assert(!servedIds.contains(1L) && !servedIds.contains(2L),
      "tombstoned (removed) ids must never reach the ADC ranking")
  }

  test("recall-vs-cost knob relations (RecallProbe table, NOTES round 13)") {
    // the measured curve's load-bearing relations, pinned so a knob
    // regression cannot hide: floors sit under the measured values
    // (seeded + order-independent fits ⇒ reproducible) with slack
    val e = Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(e, q, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "n_id").as[(Long, Long)].collect().toSet
      (got & exact).size.toDouble / exact.size
    }
    // IVF: doubling nProbe 2→8 roughly doubles recall at equal wall
    // cost on unstructured embeddings (measured 0.38 → 0.76)
    val p2 = recall(Similarity.ivfTopK(e, q, 5, nCells = 16, nProbe = 2))
    val p8 = recall(Similarity.ivfTopK(e, q, 5, nCells = 16, nProbe = 8))
    assert(p8 >= p2 && p8 >= 0.7, s"ivf nProbe=8 recall $p8 (nProbe=2: $p2)")
    // PQ at dim 64: m = 8 (8 dims/subspace) is the recall limiter —
    // m = 16 at the same re-rank depth jumped 0.72 → 0.90 measured;
    // the m knob, not depth, is the cliff next to the default
    val cb8 = Similarity.trainPq(e, dim = 64, m = 8, k = 16)
    val enc8 = Similarity.pqEncode(e, cb8)
    val cb16 = Similarity.trainPq(e, dim = 64, m = 16, k = 16)
    val enc16 = Similarity.pqEncode(e, cb16)
    val r8 = recall(Similarity.pqTopKReranked(enc8, cb8, q, e, 5, depth = 50))
    val r16 = recall(Similarity.pqTopKReranked(enc16, cb16, q, e, 5, depth = 50))
    assert(r16 >= r8 && r16 >= 0.8,
      s"m16k16 re-rank recall $r16 must beat m8k16's $r8")
    // depth recovers what ADC loses, monotonically at the ends
    val d25 = recall(Similarity.pqTopKReranked(enc8, cb8, q, e, 5, depth = 25))
    val d100 = recall(Similarity.pqTopKReranked(enc8, cb8, q, e, 5, depth = 100))
    assert(d100 >= d25 && d100 >= 0.7,
      s"depth=100 recall $d100 must beat depth=25's $d25")
  }

  test("prototypicality: per-cell drop counts exact; planted template mass drops first") {
    import spark.implicits._
    // two well-separated clusters on orthogonal axes: a TEMPLATE mass
    // of 12 near-identical vectors + 8 scattered members per cluster —
    // the D4 motivation is that the template mass hugs the centroid
    // scattered offsets alternate sign so they CANCEL in the centroid
    // (a one-sided spread would tilt the mean off the template axis
    // and scattered members could out-prototype the templates)
    def vec(axis: Int, i: Int, spread: Float): Array[Float] = {
      val v = Array.fill(8)(0.0f)
      v(axis) = 10.0f
      val sign = if (i % 2 == 0) 1.0f else -1.0f
      v((axis + 1 + i % 3) % 8) = sign * spread
      v
    }
    val rows =
      (0 until 12).map(i => (i.toLong, vec(0, i, 0.01f))) ++          // templates A
      (12 until 20).map(i => (i.toLong, vec(0, i, 3.0f))) ++          // scattered A
      (20 until 32).map(i => (100L + i, vec(4, i, 0.01f))) ++         // templates B
      (32 until 40).map(i => (100L + i, vec(4, i, 3.0f)))             // scattered B
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.prototypicality(df, "vec_id", "embedding",
      nCells = 2, dropFrac = 0.3)
      .as[(Long, Int, Double, Long, Long, Int)].collect()
    assert(out.length == 40)
    // per-cell: exactly ceil(0.3·n) dropped, ranks contiguous from 1
    out.groupBy(_._2).foreach { case (cell, members) =>
      val n = members.length
      val dropped = members.count(_._6 == 0)
      assert(dropped == math.ceil(0.3 * n).toInt, s"cell $cell: $dropped")
      assert(members.map(_._4).sorted.toSeq == (1L to n).toSeq)
      assert(members.forall(_._5 == n))
    }
    // the dropped set is dominated by the template mass (ids with
    // small scatter), which sits nearest its centroid
    val droppedIds = out.filter(_._6 == 0).map(_._1).toSet
    val templates = ((0 until 12).map(_.toLong) ++
      (20 until 32).map(i => 100L + i)).toSet
    assert(droppedIds.subsetOf(templates),
      s"dropped non-template ids: ${droppedIds -- templates}")
    // diversify = the kept ids
    val kept = Similarity.diversify(df, "vec_id", "embedding",
      nCells = 2, dropFrac = 0.3).as[Long].collect().toSet
    assert(kept == out.filter(_._6 == 1).map(_._1).toSet)
    // one-cell degenerate case: rank equals a plain-window replay over
    // the mean-centroid cosine (the d21 oracle's shape)
    val one = Similarity.prototypicality(df, "vec_id", "embedding",
      nCells = 1, dropFrac = 0.3)
      .select("vec_id", "rank").as[(Long, Long)].collect().toMap
    val meanArr = {
      val vs = rows.map(_._2)
      (0 until 8).map(i => vs.map(_(i).toDouble).sum / vs.length).toArray
    }
    def cos(a: Array[Float], m: Array[Double]): Double = {
      val dot = a.zip(m).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nm = math.sqrt(m.map(y => y * y).sum)
      dot / (na * nm)
    }
    val naive = rows.map { case (id, v) =>
      (id, BigDecimal(cos(v, meanArr)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(one == naive)
  }

  test("hardNegatives: cross-label only, ceiling guards false negatives, ANN-fed twin agrees") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1f, 0f), 0),        // the anchor
      (2L, Seq(0.9f, 0.1f), 1),    // hard negative
      (3L, Seq(1f, 0.001f), 1),    // near-identical cross-label (ceiling bait)
      (4L, Seq(0f, 1f), 1),        // easy negative
      (5L, Seq(0.95f, 0.05f), 0))  // same label: NEVER a negative
      .toDF("vec_id", "embedding", "label")
    val anchors = corpus.filter(col("vec_id") === 1)

    val top = Similarity.hardNegatives(corpus, anchors, k = 2)
      .select("rank", "n_id").as[(Int, Long)].collect().toSet
    assert(top == Set((1, 3L), (2, 2L)), "nearest cross-label first")

    val ceiled = Similarity.hardNegatives(corpus, anchors, k = 2,
        simCeiling = Some(0.999))
      .select("rank", "n_id").as[(Int, Long)].collect().toSet
    assert(ceiled == Set((1, 2L), (2, 4L)),
      "the almost-identical cross-label pair is excluded as a label error")

    // generator-agnostic twin: over-fetched brute candidates + label
    // join reproduce the exact miner (same-label rows fall out here)
    val cands = Similarity.bruteForceTopK(corpus, anchors, k = 4)
    val twin = Similarity.hardNegativesFromCandidates(cands, corpus,
        k = 2, idCol = "vec_id", labelCol = "label")
      .select("rank", "n_id").as[(Int, Long)].collect().toSet
    assert(twin == top)
  }

  test("ivfTopKFiltered: neighbors satisfy the predicate, k fills, and " +
       "nProbe=nCells equals brute force over the filtered corpus") {
    val e = Tables.embeddings(spark, sf)
    val allowed = e.filter($"label" % 2 === 0).select($"vec_id".as("id"))
    val allowedIds = allowed.as[Long].collect().toSet
    val q = e.filter($"vec_id" < 5)
    val got = Similarity.ivfTopKFiltered(e, q, k = 5, allowed, "id",
      nCells = 8, nProbe = 8)
    val rows = got.collect()
    // every emitted neighbor passes the filter — the pre-filter contract
    assert(rows.forall(r => allowedIds(r.getAs[Long]("n_id"))))
    // k fills from survivors (the post-filter failure mode would not)
    assert(rows.groupBy(_.getAs[Long]("q_id")).values.forall(_.length == 5))
    // exactness convention: every cell probed ⇒ ≡ filtered brute force
    val brute = Similarity.bruteForceTopK(
      e.join(allowed, e("vec_id") === allowed("id"), "left_semi"), q, 5)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("q_id"), r.getAs[Int]("rank"), r.getAs[Long]("n_id"))
    assert(rows.map(key).toSet == brute.collect().map(key).toSet)
  }

  test("rrfFuse: rank arithmetic exact, one-run-only docs still score") {
    val a = Seq((1L, 1, 100L), (1L, 2, 200L)).toDF("q_id", "rank", "n_id")
    val b = Seq((1L, 1, 200L), (1L, 2, 300L)).toDF("q_id", "rank", "n_id")
    val out = Similarity.rrfFuse(a, b, k = 3)
      .collect().sortBy(_.getAs[Int]("rank"))
    // 200 in both runs (1/62 + 1/61) beats 100 (1/61) beats 300 (1/62)
    assert(out.map(_.getAs[Long]("n_id")).toSeq == Seq(200L, 100L, 300L))
    val r200 = out.head.getAs[Double]("rrf")
    assert(math.abs(r200 - (1.0 / 62 + 1.0 / 61)) < 5e-7)
  }

  test("medoidAssign: argmax cell with min-seed tie-break, vectors never shuffle wide") {
    // 2-D fixture: seeds 0=(1,0), 1=(0,1); vector 10 leans x, 11 leans y,
    // 12 is EXACTLY diagonal — equal cosine to both seeds, tie → seed 0
    val corpus = Seq(
      (10L, Array(2.0f, 0.5f)), (11L, Array(0.5f, 2.0f)),
      (12L, Array(3.0f, 3.0f))).toDF("vec_id", "embedding")
    val seeds = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("seed_id", "embedding")
    val got = Similarity.medoidAssign(corpus, seeds)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 0L, 11L -> 1L, 12L -> 0L), s"got $got")
    // deterministic under physical layout
    val re = Similarity.medoidAssign(corpus.repartition(5), seeds)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(re == got)
    // the exchange after the fan-out carries skinny (id, struct) rows —
    // no window over the corpus appears in the plan
    val plan = Similarity.medoidAssign(corpus, seeds)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "medoidAssign must aggregate, not window")
  }

  test("knnJoin: nProbe=nCells is exact all-pairs; partial probing " +
       "clears a recall floor; repartition-invariant") {
    val e = Tables.embeddings(spark, sf).filter($"vec_id" < 40)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("q_id"), r.getAs[Int]("rank"), r.getAs[Long]("n_id"))
    val exact = Similarity.bruteForceTopK(e, e, 3).collect().map(key).toSet
    val full = Similarity.knnJoin(e, k = 3, nCells = 4, nProbe = 4)
      .collect().map(key).toSet
    assert(full == exact, "all cells probed must reproduce brute force")
    // every vector is a query exactly once
    assert(full.map(_._1).size == 40)
    // partial probing: recall floor (self-cell plus 1 neighbor cell
    // catches most true neighbors on a random corpus — measured ~0.9)
    val part = Similarity.knnJoin(e, k = 3, nCells = 4, nProbe = 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val exPairs = exact.map(t => (t._1, t._3))
    val recall = (part & exPairs).size.toDouble / exPairs.size
    assert(recall >= 0.6, s"knn-join nProbe=2 recall $recall below floor")
    // determinism under physical layout changes
    val re = Similarity.knnJoin(e.repartition(7), k = 3, nCells = 4, nProbe = 4)
      .collect().map(key).toSet
    assert(re == full)
  }

  test("recall floors on the full embeddings table (ann16–19): filtered " +
       "ANN, k-NN join (+fitCap), medoid canopy, PQ index via stream ingest") {
    // the ann16–19 gates pin EXACTNESS (integer-grid codebooks,
    // nProbe=nCells conventions); these floors pin the APPROXIMATE
    // regimes those operators actually run at scale, against brute-force
    // ground truth on the real 500-vector embeddings table — the
    // RecallProbe protocol asserted in the default suite. Floors are
    // measured-minus-margin (deterministic fits ⇒ tight).
    val e = Tables.embeddings(spark, sf).persist()
    val q = e.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recall(approx: Set[(Long, Long)], exact: Set[(Long, Long)]): Double =
      (approx & exact).size.toDouble / exact.size

    // ann16 — ivfTopKFiltered at PARTIAL probing (the gate runs
    // nProbe=nCells exactness): ground truth is brute force over the
    // filtered corpus
    val allowed = e.filter($"label" % 2 === 0).select($"vec_id".as("id"))
    val exactF = pairs(Similarity.bruteForceTopK(
      e.join(allowed, e("vec_id") === allowed("id"), "left_semi"), q, 5))
    val gotF = pairs(Similarity.ivfTopKFiltered(e, q, 5, allowed, "id",
      nCells = 16, nProbe = 4))
    val rF = recall(gotF, exactF)
    val gotF8 = pairs(Similarity.ivfTopKFiltered(e, q, 5, allowed, "id",
      nCells = 16, nProbe = 8))
    val rF8 = recall(gotF8, exactF)
    info(f"ann16 filtered ivf nCells=16 nProbe=4 recall $rF%.3f nProbe=8 $rF8%.3f")
    assert(rF >= 0.50, s"filtered-ANN recall $rF below floor (measured 0.58)")
    assert(rF8 >= rF && rF8 >= 0.75,
      s"filtered-ANN nProbe=8 recall $rF8 (measured 0.84; must beat nProbe=4's $rF)")

    // ann17 — knnJoin over the FULL table at partial probing, and the
    // fitCap variant (quantizer fit on a sample; assignment unchanged)
    val exactK = pairs(Similarity.bruteForceTopK(e, e, 3)
      .filter($"q_id" =!= $"n_id"))
    val gotK = pairs(Similarity.knnJoin(e, k = 3, nCells = 16, nProbe = 4))
    val rK = recall(gotK, exactK)
    val gotKCap = pairs(Similarity.knnJoin(e, k = 3, nCells = 16,
      nProbe = 4, fitCap = 250))
    val rKCap = recall(gotKCap, exactK)
    info(f"ann17 knnJoin nCells=16 nProbe=4 recall $rK%.3f fitCap=250 $rKCap%.3f")
    assert(rK >= 0.55, s"knnJoin recall $rK below floor (measured 0.599)")
    assert(rKCap >= 0.50, s"fitCap knnJoin recall $rKCap below floor (measured 0.576)")

    // ann18 — medoid cells as a canopy index: corpus assigned to 16
    // seed-medoid cells, each query searched exactly WITHIN its own
    // cell (top-1 canopy, the cheapest probe regime)
    val seeds = e.filter($"vec_id" < 16)
      .select($"vec_id".as("seed_id"), $"embedding")
    val cells = Similarity.medoidAssign(e, seeds)
      .select($"vec_id".as("n_id"), $"cell")
    val exactG = pairs(Similarity.bruteForceTopK(e, q, 5)
      .filter($"q_id" =!= $"n_id"))
    val qCells = cells.join(q.select($"vec_id".as("n_id")), "n_id")
      .select($"n_id".as("q_vec"), $"cell")
      .as[(Long, Long)].collect()
    val gotG = qCells.flatMap { case (qid, cell) =>
      val cellIds = cells.filter($"cell" === cell).select("n_id")
      val sub = e.join(cellIds, e("vec_id") === cellIds("n_id"), "left_semi")
      Similarity.bruteForceTopK(sub, e.filter($"vec_id" === qid), 6)
        .filter($"q_id" =!= $"n_id").limit(5)
        .select("q_id", "n_id").as[(Long, Long)].collect()
    }.toSet
    val rG = recall(gotG, exactG)
    info(f"ann18 medoid top-1-canopy recall $rG%.3f")
    assert(rG >= 0.85, s"medoid canopy recall $rG below floor " +
      "(measured 0.92 at top-1 cell of 16 — the honest cheap-probe number)")

    // ann19 — the PQ index AT REST, built through install + STREAMING
    // ingest with REAL trained codebooks (the gate uses integer grids
    // for oracle exactness): ADC search from the streamed index clears
    // a floor, and exact re-rank recovers more
    val base = java.nio.file.Files.createTempDirectory("ann19floor").toString
    val cb = Similarity.trainPq(e, dim = 64, m = 8, k = 16)
    Similarity.installPqIndex(e.filter($"vec_id" % 5 =!= 0), s"$base/idx", cb)
    val sliver = e.filter($"vec_id" % 5 === 0).select("vec_id", "embedding")
    sliver.filter($"vec_id" % 2 === 0).coalesce(1)
      .write.mode("append").parquet(s"$base/in")
    sliver.filter($"vec_id" % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(s"$base/in")
    val stream = spark.readStream.schema(sliver.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in")
    graft.streaming.EventStream.streamingPqIngest(stream, s"$base/idx")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt").start().awaitTermination()
    val adc = pairs(Similarity.pqTopKFromIndex(s"$base/idx", q, e, 5))
    val rAdc = recall(adc, pairs(Similarity.bruteForceTopK(e, q, 5)))
    val rr = pairs(Similarity.pqTopKFromIndex(s"$base/idx", q, e, 5,
      depth = 50))
    val rRr = recall(rr, pairs(Similarity.bruteForceTopK(e, q, 5)))
    info(f"ann19 streamed-index ADC recall $rAdc%.3f rerank d=50 $rRr%.3f")
    assert(rAdc >= 0.40, s"streamed-index ADC recall $rAdc below floor (measured 0.46)")
    assert(rRr >= rAdc && rRr >= 0.65,
      s"streamed-index re-rank recall $rRr below floor (measured 0.72; ADC $rAdc)")
    e.unpersist()
  }
}
