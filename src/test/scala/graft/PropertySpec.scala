package graft

import graft.ops.{ColumnOps, Imputation}
import graft.metrics.Psi
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (FIXTURES.md §7) over the ops library.
  * Raw ScalaCheck generators with fixed seeds (the scalatest-scalacheck
  * bridge isn't in the offline cache); 8 samples per property — each
  * check is a full Spark job.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int = 8): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("parseEmpLength never throws; non-null input never yields null") {
    val gen = Gen.listOfN(20, Gen.oneOf(
      Gen.alphaNumStr, Gen.const("10+ years"), Gen.const("< 1 year"),
      Gen.const("missing"), Gen.chooseNum(0, 99).map(n => s"$n years"),
      Gen.const(""), Gen.const("  7 YEARS  ")))
    samples(gen).foreach { xs =>
      val out = xs.toDF("e")
        .select(ColumnOps.parseEmpLength($"e").as("v")).collect()
      assert(out.forall(!_.isNullAt(0)))
      xs.zip(out.map(_.getInt(0))).foreach {
        case ("10+ years", v) => assert(v == 10)
        case ("< 1 year", v)  => assert(v == 0)
        case ("missing", v)   => assert(v == -1)
        case ("  7 YEARS  ", v) => assert(v == 7) // trim + lower + digits
        case _ => ()
      }
    }
  }

  test("oneHot: row sum is 1 for in-dictionary values, 0 otherwise") {
    val cats = Seq("A", "B", "C")
    val gen = Gen.nonEmptyListOf(Gen.oneOf("A", "B", "C", "D", "zz", ""))
    samples(gen).foreach { xs =>
      val out = xs.toDF("c")
        .select($"c" +: ColumnOps.oneHot("c", cats): _*).collect()
      out.foreach { r =>
        val s = (1 to cats.size).map(r.getInt).sum
        assert(s == (if (cats.contains(r.getString(0))) 1 else 0))
      }
    }
  }

  test("modesOf agrees with naive per-column mode on random data") {
    val gen = for {
      is <- Gen.listOfN(30, Gen.chooseNum(0, 5))
      ss <- Gen.listOfN(30, Gen.oneOf("x", "y", "z"))
    } yield is.zip(ss)
    samples(gen).foreach { rows =>
      val df = rows.toDF("i", "s")
      val modes = Imputation.modesOf(df, Seq("i", "s")).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      def naive(vals: Seq[String]): String =
        vals.groupBy(identity).toSeq
          .sortBy { case (v, g) => (-g.size, v) }.head._1
      assert(modes("i") == naive(rows.map(_._1.toString)))
      assert(modes("s") == naive(rows.map(_._2)))
    }
  }

  test("PSI is non-negative and zero on identical distributions") {
    val gen = for {
      as <- Gen.listOfN(50, Gen.chooseNum(-100.0, 100.0))
      bs <- Gen.listOfN(50, Gen.chooseNum(-100.0, 100.0))
    } yield (as, bs)
    samples(gen, 4).foreach { case (as, bs) =>
      val e = as.toDF("v"); val a = bs.toDF("v")
      val psi = Psi.psi(e, a, "v").as[Double].first()
      assert(psi >= -1e-12, s"psi $psi negative")
      val self = Psi.psi(e, e, "v").as[Double].first()
      assert(math.abs(self) < 1e-9)
    }
  }

  test("packSequences conserves tokens and chunk ids are shard-monotone") {
    import graft.operators.TextAnalysis
    val gen = Gen.listOfN(40, Gen.chooseNum(1, 30))
    samples(gen, 4).foreach { lens =>
      val df = lens.zipWithIndex
        .map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
        .toDF("id", "text")
      val out = TextAnalysis.packSequences(df, "id", "text", budget = 16, shards = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.map(_._3).sum == lens.map(_.toLong).sum, "token conservation")
      out.groupBy(_._2).foreach { case (_, rows) =>
        val byId = rows.sortBy(_._1)
        assert(byId.map(_._4).toSeq == byId.map(_._4).sorted.toSeq,
          "chunk ids monotone in id")
        // a doc starts in the chunk its preceding tokens filled up to
        byId.foldLeft(0L) { case (cum, (_, _, n, chunk)) =>
          assert(chunk == cum / 16, s"chunk $chunk vs cum $cum")
          cum + n
        }
      }
    }
  }

  test("epochMix: row count = sum of per-group epochs; epoch ids contiguous") {
    val epochs = Map("a" -> 3, "b" -> 2)
    val gen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d"))
    samples(gen, 4).foreach { gs =>
      val df = gs.zipWithIndex.map { case (g, i) => (i.toLong, g) }.toDF("id", "g")
      val out = graft.ops.Sampling.epochMix(df, "g", epochs)
      assert(out.count() == gs.map(g => epochs.getOrElse(g, 1)).sum.toLong)
      val perId = out.select("id", "epoch").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      perId.foreach { case (id, es) =>
        assert(es == (1L to epochs.getOrElse(gs(id.toInt), 1).toLong),
          s"row $id (group ${gs(id.toInt)}) epochs $es")
      }
    }
  }

  test("shuffleShard: (shard, pos) is a bijection onto the input rows") {
    samples(Gen.chooseNum(1, 200), 4).foreach { n =>
      val df = (0 until n).map(_.toLong).toDF("id")
      val out = graft.ops.Sampling.shuffleShard(df, "id", 4)
        .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
      assert(out.length == n)
      assert(out.map(r => (r._2, r._3)).distinct.length == n,
        "(shard, pos) pairs must be unique")
      out.groupBy(_._2).foreach { case (s, rows) =>
        assert(rows.map(_._3).sorted.toSeq == (1L to rows.length.toLong),
          s"shard $s positions not a contiguous ranking")
      }
    }
  }

  test("connectedComponents: every label is a component member <= the node") {
    import graft.operators.Dedup
    val gen = Gen.listOfN(25,
      for { a <- Gen.chooseNum(0L, 15L); b <- Gen.chooseNum(0L, 15L) if a != b }
        yield (math.min(a, b), math.max(a, b)))
    samples(gen, 4).filter(_.nonEmpty).foreach { pairs =>
      val labels = Dedup.connectedComponents(
          pairs.toDF("id_a", "id_b"), "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      // union-find ground truth
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val roots = parent.keys.map(n => n -> find(n)).toMap
      val minOfComp = roots.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
      labels.foreach { case (node, label) =>
        assert(label == minOfComp(roots(node)),
          s"node $node labeled $label, expected ${minOfComp(roots(node))}")
      }
    }
  }

  test("removeSelfRepetition matches the brute-force position-set model") {
    // random dup-dense docs (3-token vocabulary) vs a pure-Scala model
    // of the covered-position semantics — the ground truth the interval
    // sweep (mergedDropIntervals + gap-slice rebuild) must preserve
    // exactly. Exercises adjacency merges, overlap unions, full
    // coverage, and sub-n docs across 80 random documents.
    import graft.operators.Dedup
    val n = 3
    // len >= 1: a fully-empty text hits the JVM "".split artifact
    // (one empty token) — an edge the real corpus never carries and
    // the oracle queries already pin
    val gen = for {
      len <- Gen.chooseNum(1, 30)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
    } yield ws.mkString(" ")
    val docs = samples(gen, 80).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val out = Dedup.removeSelfRepetition(docs.toDF("doc_id", "text"),
        "doc_id", "text", n)
      .select("doc_id", "n_toks", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    docs.foreach { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val covered = scala.collection.mutable.Set[Int]()
      if (toks.length >= n) {
        val firstPos = scala.collection.mutable.Map[String, Int]()
        (0 to toks.length - n).foreach { p =>
          val g = toks.slice(p, p + n).mkString(" ")
          if (firstPos.contains(g)) covered ++= (p until p + n)
          else firstPos(g) = p
        }
      }
      val kept = toks.indices.filterNot(covered).map(toks)
      val expected = (toks.length.toLong, kept.length.toLong, kept.mkString(" "))
      assert(out(id) == expected,
        s"doc $id ('$text'): got ${out(id)}, model says $expected")
    }
  }

  test("removeDupSpans matches the brute-force global keep-first model") {
    // cross-doc twin of the self-repetition property: the global
    // first-occurrence rule (min (doc, pos) lexicographic) over random
    // dup-dense docs, vs a pure-Scala sweep
    import graft.operators.Dedup
    val n = 3
    val gen = for {
      len <- Gen.chooseNum(1, 25)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
    } yield ws.mkString(" ")
    val docs = samples(gen, 40).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val out = Dedup.removeDupSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", n)
      .select("doc_id", "n_toks", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // model: global first occurrence per gram across ALL docs in
    // (doc, pos) lexicographic order; every other occurrence covers
    val tokd = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty) }
    val first = scala.collection.mutable.Map[String, (Long, Int)]()
    tokd.sortBy(_._1).foreach { case (id, toks) =>
      (0 to toks.length - n).foreach { p =>
        val g = toks.slice(p, p + n).mkString(" ")
        if (!first.contains(g)) first(g) = (id, p)
      }
    }
    tokd.foreach { case (id, toks) =>
      val covered = scala.collection.mutable.Set[Int]()
      (0 to toks.length - n).foreach { p =>
        val g = toks.slice(p, p + n).mkString(" ")
        if (first(g) != ((id, p))) covered ++= (p until p + n)
      }
      val kept = toks.indices.filterNot(covered).map(toks)
      val expected = (toks.length.toLong, kept.length.toLong, kept.mkString(" "))
      assert(out(id) == expected,
        s"doc $id: got ${out(id)}, model says $expected")
    }
  }

  test("boilerplate store path equals the batch operator over the union") {
    // cross-batch correctness: electing from ACCUMULATED store counts
    // and rewriting batch 2 must equal running the batch operator over
    // batch1 ∪ batch2 and keeping batch 2's rows — the store IS the
    // union's election state
    import graft.operators.Dedup
    val n = 3
    val gen = for {
      len <- Gen.chooseNum(3, 15)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
      src <- Gen.oneOf("s1", "s2")
    } yield (src, ws.mkString(" "))
    val rows = samples(gen, 60).zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
    val (rows1, rows2) = rows.partition(_._1 % 2 == 0)
    val b1 = rows1.toDF("doc_id", "source", "text")
    val b2 = rows2.toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("boilprop").toString
    Dedup.writeBoilerplateStore(b1, "doc_id", "text", "source", dir, n)
    Dedup.appendToBoilerplateStore(b2, dir, "doc_id", "text", "source", 1L)
    val store2 = Dedup.removeBoilerplateFromStore(b2, dir,
      "doc_id", "text", "source", minDocs = 3)
    val unionOp = Dedup.removeBoilerplate(b1.unionByName(b2),
        "doc_id", "text", "source", n, minDocs = 3)
      .join(b2.select("doc_id"), Seq("doc_id"), "left_semi")
    assert(store2.except(unionOp).count() == 0 &&
      unionOp.except(store2).count() == 0,
      "store election must equal the union operator's on batch-2 rows")
  }

  test("grade labelMap is a bijection A-G <-> 0-6 and null off-domain") {
    import graft.pipeline.Schemas
    val gen = Gen.nonEmptyListOf(
      Gen.oneOf("A", "B", "C", "D", "E", "F", "G", "H", "@"))
    samples(gen).foreach { xs =>
      val out = xs.toDF("g")
        .select($"g", ColumnOps.labelMap($"g", Schemas.gradeMapping).as("v")).collect()
      out.foreach { r =>
        val g = r.getString(0)
        if (g >= "A" && g <= "G") assert(r.getInt(1) == g.head - 'A')
        else assert(r.isNullAt(1))
      }
    }
  }

  test("decontaminateRewrite agrees with a naive reimplementation") {
    import graft.operators.Dedup
    val n = 3 // word-3-grams keep the naive side cheap
    // tiny vocab → dense overlap between random corpus and eval docs
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    val doc = Gen.chooseNum(1, 10)
      .flatMap(len => Gen.listOfN(len, word)).map(_.mkString(" "))
    val gen = for {
      corpus <- Gen.listOfN(6, doc)
      eval <- Gen.listOfN(2, doc)
    } yield (corpus, eval)
    samples(gen).foreach { case (corpusTexts, evalTexts) =>
      val corpus = corpusTexts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val eval = evalTexts.zipWithIndex
        .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
      val out = Dedup.decontaminateRewrite(corpus, eval, "doc_id", "text", n)
        .select("doc_id", "n_toks", "n_kept", "clean_text")
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> r).toMap
      // naive twin: covered = union of positions of grams in the eval set
      val evalGrams = evalTexts.flatMap(_.split("\\s+").toSeq.sliding(n))
        .filter(_.size == n).map(_.mkString(" ")).toSet
      corpusTexts.zipWithIndex.foreach { case (t, i) =>
        val toks = t.trim.split("\\s+").toSeq
        val covered = toks.sliding(n).zipWithIndex
          .filter { case (g, _) => g.size == n && evalGrams(g.mkString(" ")) }
          .flatMap { case (_, p) => p until p + n }.toSet
        val kept = toks.zipWithIndex.filterNot(x => covered(x._2)).map(_._1)
        val (id, nT, nK, clean) = out(i.toLong)
        assert(nT == toks.size && nK == kept.size && clean == kept.mkString(" "),
          s"doc $id: expected ${kept.mkString(" ")}, got $clean")
      }
    }
  }

  test("decontaminateRewriteAuto's Bloom route equals the direct rewrite") {
    import graft.operators.Dedup
    val n = 3
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    val doc = Gen.chooseNum(1, 10)
      .flatMap(len => Gen.listOfN(len, word)).map(_.mkString(" "))
    val gen = for {
      corpus <- Gen.listOfN(6, doc)
      eval <- Gen.listOfN(2, doc)
    } yield (corpus, eval)
    samples(gen).foreach { case (corpusTexts, evalTexts) =>
      val corpus = corpusTexts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val eval = evalTexts.zipWithIndex
        .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id", "n_toks", "n_kept", "clean_text")
          .as[(Long, Long, Long, String)].collect().toSet
      val direct = rows(
        Dedup.decontaminateRewrite(corpus, eval, "doc_id", "text", n))
      // maxBroadcastGrams = 0 forces flag-then-rewrite; bit-identical
      // output is the routing contract (t19's gate), here fuzzed over
      // dense-overlap corpora where flagging mistakes would surface
      val routed = rows(Dedup.decontaminateRewriteAuto(
        corpus, eval, "doc_id", "text", n, maxBroadcastGrams = 0L))
      assert(routed == direct,
        s"routes diverged:\n direct=$direct\n routed=$routed")
    }
  }

  test("removeBoilerplate agrees with a naive reimplementation") {
    import graft.operators.Dedup
    val n = 2 // word-2-grams keep the naive side dense on a tiny vocab
    val word = Gen.oneOf("a", "b", "c", "d")
    val doc = for {
      len <- Gen.chooseNum(1, 8)
      toks <- Gen.listOfN(len, word)
      src <- Gen.oneOf("s1", "s2")
    } yield (toks.mkString(" "), src)
    val gen = Gen.listOfN(8, doc)
    samples(gen).foreach { docs =>
      val df = docs.zipWithIndex
        .map { case ((t, s), i) => (i.toLong, s, t) }
        .toDF("doc_id", "source", "text")
      val out = Dedup.removeBoilerplate(df, "doc_id", "text", "source",
          n, minDocs = 2)
        .select("doc_id", "n_toks", "n_kept", "clean_text")
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> r).toMap
      // naive twin: per source, grams present in >= 2 DISTINCT docs;
      // every occurrence's positions drop (no keep-first)
      val boiler: Map[String, Set[String]] = docs.zipWithIndex
        .groupBy(_._1._2)
        .map { case (src, ds) =>
          src -> ds
            .flatMap { case ((t, _), i) =>
              t.trim.split("\\s+").toSeq.sliding(n).filter(_.size == n)
                .map(_.mkString(" ")).toSet.toSeq.map((g: String) => (g, i))
            }
            .groupBy(_._1).filter(_._2.size >= 2).keySet
        }
      docs.zipWithIndex.foreach { case ((t, src), i) =>
        val toks = t.trim.split("\\s+").toSeq
        val bg = boiler.getOrElse(src, Set.empty)
        val covered = toks.sliding(n).zipWithIndex
          .filter { case (g, _) => g.size == n && bg(g.mkString(" ")) }
          .flatMap { case (_, p) => p until p + n }.toSet
        val kept = toks.zipWithIndex.filterNot(x => covered(x._2)).map(_._1)
        val (id, nT, nK, clean) = out(i.toLong)
        assert(nT == toks.size && nK == kept.size && clean == kept.mkString(" "),
          s"doc $id src $src: expected '${kept.mkString(" ")}', got '$clean'")
      }
    }
  }

  test("topTokensPerGroup and skewStats agree with naive twins") {
    import graft.operators.TextAnalysis
    import graft.ops.Skew
    val gen = Gen.nonEmptyListOf(for {
      g <- Gen.oneOf("g1", "g2")
      t <- Gen.listOfN(4, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))
    } yield (g, t))
    samples(gen).foreach { rows =>
      val df = rows.toDF("grp", "text")
      val out = TextAnalysis.topTokensPerGroup(df, "grp", "text", 2)
        .select("grp", "token", "n", "rank")
        .as[(String, String, Long, Int)].collect().toSet
      val naive = rows.groupBy(_._1).flatMap { case (g, rs) =>
        rs.flatMap(_._2.split(" ")).groupBy(identity)
          .map { case (t, os) => (t, os.size.toLong) }.toSeq
          .sortBy { case (t, c) => (-c, t) }.take(2).zipWithIndex
          .map { case ((t, c), i) => (g, t, c, i + 1) }
      }.toSet
      assert(out == naive)
      // skewStats over the group column
      val s = Skew.skewStats(df, "grp", topK = 1)
        .select("n_keys", "n_rows", "max_n", "top_share")
        .as[(Long, Long, Long, Double)].collect().head
      val counts = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      assert(s._1 == counts.size && s._2 == rows.size &&
        s._3 == counts.values.max)
      assert(math.abs(s._4 - counts.values.max.toDouble / rows.size) < 1e-6)
    }
  }

  test("clusterKeepers invariants hold on random pair graphs") {
    import graft.operators.Dedup
    val gen = for {
      nDocs <- Gen.chooseNum(4, 10)
      pairs <- Gen.listOf(for {
        a <- Gen.chooseNum(0, nDocs - 1)
        b <- Gen.chooseNum(0, nDocs - 1) if a != b
      } yield (math.min(a, b).toLong, math.max(a, b).toLong))
      qs <- Gen.listOfN(nDocs, Gen.chooseNum(0, 3).map(_ * 0.25))
    } yield (nDocs, pairs.distinct, qs)
    samples(gen).foreach { case (nDocs, pairs, qs) =>
      val docs = qs.zipWithIndex
        .map { case (q, i) => (i.toLong, q) }.toDF("doc_id", "q0")
      val pairDf = pairs.toDF("id_a", "id_b")
      val out = Dedup.clusterKeepers(docs, "doc_id", $"q0", pairDf)
        .select("doc_id", "cluster_id", "q", "keeper_id", "n_members", "kept")
        .as[(Long, Long, Double, Long, Long, Int)].collect()
      assert(out.length == nDocs, "one row per doc")
      val byCluster = out.groupBy(_._2)
      assert(byCluster.values.map(_.length.toLong).sum == nDocs)
      byCluster.foreach { case (cid, members) =>
        assert(members.forall(_._5 == members.length), "n_members consistent")
        val keeper = members.filter(_._6 == 1)
        assert(keeper.length == 1, s"cluster $cid: exactly one keeper")
        val k = keeper.head
        assert(k._1 == k._4 && members.forall(_._4 == k._1),
          "keeper_id consistent and self-kept")
        val maxQ = members.map(_._3).max
        assert(k._3 == maxQ, "keeper has the max quality")
        assert(k._1 == members.filter(_._3 == maxQ).map(_._1).min,
          "quality ties break to the smallest id")
        // cluster label is the component's min id (connectedComponents
        // contract riding through)
        assert(cid == members.map(_._1).min)
      }
      // connectivity: every pair's endpoints share a cluster
      val label = out.map(r => r._1 -> r._2).toMap
      pairs.foreach { case (a, b) =>
        assert(label(a) == label(b), s"pair ($a,$b) split across clusters")
      }
    }
  }

  test("scd2History invariants hold on random snapshot streams") {
    import graft.ops.Scd
    // random (key, version, value) snapshots: few keys, few values →
    // plenty of suppressed re-lands and multi-change histories
    val gen = Gen.nonEmptyListOf(for {
      k <- Gen.chooseNum(1, 4)
      v <- Gen.chooseNum(1, 6)
      s <- Gen.oneOf("a", "b", "c")
    } yield (k.toLong, v, s)).map(_.distinctBy(r => (r._1, r._2)))
    samples(gen).foreach { rows =>
      val df = rows.toDF("k", "version", "v")
      val h = Scd.scd2History(df, Seq("k"), "version", Seq("v"))
        .select("k", "version", "v", "valid_from", "valid_to", "is_current")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getInt(3), if (r.isNullAt(4)) None else Some(r.getInt(4)),
          r.getInt(5)))
      val byKey = h.groupBy(_._1)
      byKey.foreach { case (k, rs) =>
        val sorted = rs.sortBy(_._4)
        // exactly one current row per key, and it is the LAST interval
        assert(rs.count(_._6 == 1) == 1)
        assert(sorted.last._6 == 1 && sorted.last._5.isEmpty)
        // intervals chain: each valid_to equals the next valid_from
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._5.contains(b._4), s"key $k: gap ${a._5} -> ${b._4}")
            // consecutive kept rows must differ in the tracked value
            assert(a._3 != b._3, s"key $k: suppressed row leaked")
          case _ => ()
        }
        // the first interval starts at the key's earliest snapshot
        val minVersion = rows.filter(_._1 == k).map(_._2).min
        assert(sorted.head._4 == minVersion)
      }
    }
  }

  test("bigramLogProb agrees with a naive in-memory model") {
    import graft.operators.TextAnalysis
    val word = Gen.oneOf("a", "b", "cc", "dd", "e")
    val doc = Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val gen = Gen.chooseNum(3, 10).flatMap(n => Gen.listOfN(n, doc))
    samples(gen, 6).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val out = TextAnalysis.bigramLogProb(docs.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .toMap
      // naive model: same tokenization (split of "" is [""], matching
      // Spark's split(trim(text), "\\s+")), MLE bigram + add-one
      // unigram, caps never bind at this size
      def toks(t: String) = t.trim.split("\\s+").toSeq
      val all = docs.flatMap(d => toks(d._2))
      val uc = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val denom = (all.size + uc.size).toDouble
      def bigs(t: String) = {
        val w = toks(t)
        if (w.size < 2) Seq.empty
        else w.sliding(2).map(p => (p.head, p(1))).toSeq
      }
      val bcnt = docs.flatMap(d => bigs(d._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      docs.foreach { case (id, t) =>
        val bg = bigs(t)
        val (n, s) = out(id)
        assert(n == bg.size.toLong, s"doc $id bigram count")
        if (bg.isEmpty) assert(s.isEmpty, s"doc $id must have a NULL score")
        else {
          val terms = bg.map { case (p, c) =>
            val pb = bcnt.getOrElse((p, c), 0L).toDouble / uc(p)
            math.log(pb * 0.7 +
              ((uc.getOrElse(c, 0L) + 1).toDouble / denom) * (1 - 0.7))
          }
          val expect = terms.sum / terms.size
          assert(math.abs(s.get - expect) < 1.1e-6,
            s"doc $id score ${s.get} vs naive $expect")
        }
      }
    }
  }

  test("unimaxCensus invariants hold on random language mixes") {
    import graft.ops.Sampling
    val gen = for {
      nLangs <- Gen.chooseNum(1, 5)
      sizes <- Gen.listOfN(nLangs, Gen.chooseNum(1, 40))
      budget <- Gen.chooseNum(0L, 2000L)
      epochs <- Gen.chooseNum(1, 3)
    } yield (sizes, budget, epochs)
    samples(gen, 6).foreach { case (sizes, budget, epochs) =>
      val docs = sizes.zipWithIndex.flatMap { case (n, li) =>
        (1 to n).map(i =>
          (li * 1000L + i, s"l$li", "five short tokens in here"))
      }
      val df = docs.toDF("doc_id", "lang", "text")
      val out = Sampling.unimaxCensus(df, "doc_id", "lang", "text",
          budget, epochs)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      val perLangToks = docs.groupBy(_._2).view
        .mapValues(_.size.toLong * 5).toMap // 5 tokens per doc
      out.foreach { case (lang, cap, alloc, nSel, tokSel) =>
        assert(cap == perLangToks(lang) * epochs, s"$lang cap")
        assert(alloc >= 0 && alloc <= cap, s"$lang alloc in [0, cap]")
        // greedy prefix: selected tokens never exceed the allocation
        // and undershoot by less than one doc's tokens
        assert(tokSel <= alloc && alloc - tokSel < 5, s"$lang census")
        assert(tokSel == nSel * 5, s"$lang doc/token consistency")
      }
      val totalAlloc = out.map(_._3).sum
      val totalCap = out.map(_._2).sum
      assert(totalAlloc == math.min(budget, totalCap),
        s"budget fully spent or every language capped: $totalAlloc")
      // water filling: processed in ascending cap order, allocations
      // are non-decreasing (equal shares except where the cap binds)
      val byCap = out.sortBy(r => (r._2, r._1)).map(_._3)
      byCap.sliding(2).foreach {
        case Array(a, b) =>
          assert(a <= b, s"allocs must be monotone: ${byCap.toSeq}")
        case _ => ()
      }
    }
  }

  test("renderChat: offsets partition the render exactly for arbitrary turns") {
    import graft.operators.Instruction
    // arbitrary conversations: 1-6 turns, arbitrary role/text strings
    // (template injection included — a text containing '<|end|>' must
    // not corrupt the offsets, which are computed from lengths, not
    // by searching for markers)
    val turnGen = for {
      role <- Gen.oneOf("user", "assistant", "system", "tool")
      text <- Gen.oneOf(Gen.alphaNumStr,
        Gen.const("<|end|>"), Gen.const(""), Gen.const("a b  c"),
        Gen.const("多语言 текст"))
    } yield (role, text)
    val convGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, turnGen))
    samples(convGen).zipWithIndex.foreach { case (conv, ci) =>
      val rows = conv.zipWithIndex.map { case ((role, text), i) =>
        (ci.toLong, i.toLong, role, text)
      }
      val out = Instruction.renderChat(
        rows.toDF("conv_id", "turn", "role", "txt"),
        "conv_id", "turn", "role", "txt").head()
      val text = out.getAs[String]("text")
      val start = out.getAs[Long]("resp_start").toInt
      val len = out.getAs[Long]("resp_len").toInt
      // the three invariants the loss mask depends on
      assert(out.getAs[Long]("n_turns") == conv.length.toLong)
      assert(start + len == text.length, "response span ends the render")
      val (lastRole, lastText) = conv.last
      assert(text.substring(start, start + len) ==
        s"<|$lastRole|>$lastText<|end|>", "span slices the final turn")
    }
  }
}
