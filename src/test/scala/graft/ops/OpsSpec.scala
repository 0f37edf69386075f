package graft.ops

import graft.SparkSpec
import graft.metrics.Psi
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("parseEmpLength covers the reference's UDF contract") {
    val cases = Seq(
      ("10+ years", Some(10)), ("< 1 year", Some(0)), ("missing", Some(-1)),
      ("3 years", Some(3)), ("7 years", Some(7)), ("garbage", Some(-1)),
      ("99999999999 years", Some(-1)), // int overflow -> -1, not ANSI crash
      (null.asInstanceOf[String], None))
    val df = cases.map(_._1).toDF("e")
    val out = df.select(ColumnOps.parseEmpLength($"e").as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(out.toSeq == cases.map(_._2))
  }

  test("epochMix replicates per-group with a 1-based epoch index, map-side") {
    val df = Seq((0L, "wiki"), (1L, "wiki"), (2L, "web"), (3L, "books"))
      .toDF("id", "src")
    val out = Sampling.epochMix(df, "src", Map("wiki" -> 3, "books" -> 2))
    val byId = out.select("id", "epoch").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byId(0L) == Seq(1L, 2L, 3L) && byId(1L) == Seq(1L, 2L, 3L))
    assert(byId(2L) == Seq(1L))          // unlisted group -> defaultEpochs
    assert(byId(3L) == Seq(1L, 2L))
    // zero shuffle: the replication is a generate, never an exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"epochMix must not shuffle:\n$plan")
    intercept[IllegalArgumentException] {
      Sampling.epochMix(df, "src", Map("wiki" -> 0))
    }
  }

  test("shuffleShard: deterministic, partition-independent, contiguous positions") {
    val docs = graft.core.Tables.documents(spark, sf).select("doc_id")
    val a = Sampling.shuffleShard(docs, "doc_id", 8)
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect().toSet
    // reproducible across runs AND input partitionings
    val b = Sampling.shuffleShard(docs.repartition(13), "doc_id", 8)
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    val byShard = a.groupBy(_._2)
    assert(byShard.keySet == (0L until 8L).toSet, "all shards populated")
    // positions are a contiguous 1..n ranking within each shard
    byShard.foreach { case (s, rows) =>
      val ps = rows.map(_._3).toSeq.sorted
      assert(ps == (1L to rows.size.toLong), s"shard $s positions not contiguous")
    }
    // no shard takes a wildly outsized share (md5 prefix is uniform)
    val sizes = byShard.values.map(_.size)
    assert(sizes.max < sizes.min * 3, s"shard skew: $sizes")
  }

  test("oneHot: exactly one 1 per row for in-dictionary values, all-zero otherwise") {
    val df = Seq("RENT", "OWN", "MORTGAGE", "SURPRISE").toDF("h")
    val cats = Seq("RENT", "OWN", "MORTGAGE")
    val out = df.select(Seq($"h") ++ ColumnOps.oneHot("h", cats): _*).collect()
    out.foreach { r =>
      val ones = (1 to 3).map(r.getInt).sum
      if (r.getString(0) == "SURPRISE") assert(ones == 0) else assert(ones == 1)
    }
  }

  test("labelMap is a bijection on its domain, null off-domain") {
    val mapping = Seq("A" -> 0, "B" -> 1, "C" -> 2, "D" -> 3, "E" -> 4, "F" -> 5, "G" -> 6)
    val df = ('A' to 'G').map(_.toString).toDF("g")
    val out = df.select(ColumnOps.labelMap($"g", mapping).as("v")).as[Int].collect()
    assert(out.toSeq == (0 to 6))
    val off = Seq("Z").toDF("g").select(ColumnOps.labelMap($"g", mapping)).collect()
    assert(off(0).isNullAt(0))
  }

  test("modesOf computes all modes in one pass; ties break by value") {
    val df = Seq(
      ("a", 1), ("a", 2), ("b", 2), ("b", 1), ("c", 1)).toDF("s", "i")
    val modes = Imputation.modesOf(df, Seq("s", "i")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(modes("s") == "a") // a,b tie at 2 -> 'a' smallest
    assert(modes("i") == "1") // 1 appears 3x
  }

  test("meanImpute leaves no nulls and preserves non-null values") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val out = Imputation.meanImpute(df, "v").as[Double].collect().sorted
    assert(out.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("meanImpute on an all-null column is a no-op, not an NPE") {
    val df = Seq[Option[Double]](None, None).toDF("v")
    val out = Imputation.meanImpute(df, "v")
    assert(out.filter($"v".isNull).count() == 2)
  }

  test("modeImpute fills nulls with per-column mode") {
    val df = Seq(Some("x"), Some("x"), Some("y"), None).toDF("c")
    val out = Imputation.modeImpute(df, Seq("c")).as[String].collect()
    assert(out.count(_ == "x") == 3)
  }

  test("quotaSample caps each group, deterministically, independent of partitioning") {
    val df = (1L to 200L).map(i => (if (i % 3 == 0) "de" else "en", i))
      .toDF("lang", "id")
    val a = Sampling.quotaSample(df, "lang", "id", 10)
      .as[(String, Long)].collect().toSet
    assert(a.count(_._1 == "de") == 10 && a.count(_._1 == "en") == 10)
    // same selection regardless of physical layout (md5 rank, no RNG)
    val b = Sampling.quotaSample(df.repartition(7), "lang", "id", 10)
      .as[(String, Long)].collect().toSet
    assert(a == b)
    // quota above group size keeps the whole group
    val small = Sampling.quotaSample(df.filter($"id" <= 5), "lang", "id", 10)
    assert(small.count() == 5)
  }

  test("weightedSample: deterministic ES draw — weights drive inclusion, brute-force parity") {
    // 400 keys, weight 10x for ids % 4 == 0: the heavy quarter must win
    // far more than its 25% share of a 100-row draw, light rows still
    // get in (it's a weighted draw, not a top-k by weight)
    val df = (1L to 400L)
      .map(i => (i, if (i % 4 == 0) 10000000000000L else 1000000000000L))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", n = 100,
        weightScale = 1e12)
      .select("id").as[Long].collect().toSet
    assert(got.size == 100)
    val heavy = got.count(_ % 4 == 0)
    assert(heavy > 50, s"10x-weighted quarter must dominate the draw: $heavy")
    assert(heavy < 100, s"light rows must still appear: $heavy")
    // exact parity with a brute-force replay of the formula
    def hex6(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(id.toString.getBytes("UTF-8"))
        .take(3).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
    }
    val brute = (1L to 400L).map { i =>
      val w = if (i % 4 == 0) 1e13 else 1e12
      val u = (hex6(i) + 1.0) / 16777216.0
      val prio = BigDecimal(math.log(u) * 1e12 / w)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (i, prio)
    }.sortBy { case (i, p) => (-p, i) }.take(100).map(_._1).toSet
    assert(got == brute, s"missing ${brute -- got}, extra ${got -- brute}")
    // partitioning-independent (hash noise, no RNG state)
    val again = Sampling.weightedSample(df.repartition(7), "id", "w",
        n = 100, weightScale = 1e12)
      .select("id").as[Long].collect().toSet
    assert(again == got)
  }

  test("weightedSample plan: TakeOrdered cut, no corpus-wide window") {
    // the 100 TB posture: the top-n cut must be a distributed
    // TakeOrdered (per-partition heads + driver merge of n rows), and
    // no Window with an empty partition spec may appear anywhere
    val df = (1L to 5000L).map(i => (i, 1000000000000L)).toDF("id", "w")
    val out = Sampling.weightedSample(df, "id", "w", n = 50,
      weightScale = 1e12)
    out.collect()
    val plan = out.queryExecution.executedPlan
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case _ => Seq.empty
      }
      Seq(p) ++ inner ++ p.children.flatMap(walk)
    }
    val nodes = walk(plan)
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      s"expected TakeOrderedAndProject in:\n${plan.treeString}")
    val badWindows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(badWindows.isEmpty, "no global window in the draw")
  }

  test("requireUniqueKeys: loud failure on a duplicated draw key, silence on clean input") {
    val clean = Seq(("en", 1L), ("en", 2L), ("de", 1L)).toDF("g", "k")
    Sampling.requireUniqueKeys(clean, "g", "k") // must not throw
    val dirty = clean.unionByName(Seq(("en", 2L)).toDF("g", "k"))
    val e = intercept[IllegalArgumentException] {
      Sampling.requireUniqueKeys(dirty, "g", "k")
    }
    assert(e.getMessage.contains("contract violated"), e.getMessage)
  }

  test("text-quality PSI: parity slices read stable, a junk-polluted snapshot flags") {
    import graft.metrics.Psi
    import graft.operators.TextAnalysis
    val stop = Seq("the", "a", "of", "and", "is", "to", "in")
    val docs = graft.core.Tables.documents(spark, sf)
    val scored = docs.select($"doc_id",
      TextAnalysis.qualityScore($"text", stop).as("q"))
    val stable = Psi.psi(scored.filter($"doc_id" % 3 =!= 0),
        scored.filter($"doc_id" % 3 === 0), "q")
      .as[Double].head()
    // < 0.1 is the standard "no action" PSI band; 500-doc slices carry
    // real sampling noise (measured 0.076 at sf0.001), so the tight
    // 0.05 band is for bigger snapshots
    assert(stable < 0.1, s"same-distribution slices must read stable: $stable")
    // pollute the snapshot with degenerate one-token docs: quality
    // collapses and the monitor must flag
    val junk = (0 until 300).map(i => (100000L + i, "zzz"))
      .toDF("doc_id", "text")
    val polluted = scored.unionByName(junk.select($"doc_id",
      TextAnalysis.qualityScore($"text", stop).as("q")))
    val drifted = Psi.psi(scored, polluted, "q").as[Double].head()
    assert(drifted > 0.25 && drifted > stable * 3,
      s"polluted snapshot must flag: $drifted vs stable $stable")
  }

  test("dsirSelect picks target-like docs, deterministically, ranks contiguous") {
    // target vocabulary {aa..ad}, off-target {zz..zc}: docs sharing the
    // target's buckets must outrank the disjoint-vocabulary docs
    val target = (1L to 20L).map(i => (1000L + i, "aa ab ac ad aa ab"))
      .toDF("doc_id", "text")
    val raw = ((1L to 30L).map(i => (i, "aa ab ac ad aa ac")) ++
      (31L to 60L).map(i => (i, "zz zy zx zw zv zu")))
      .toDF("doc_id", "text")
    val out = Sampling.dsirSelect(raw, target, "doc_id", "text", n = 30)
      .as[(Long, Double, Long)].collect().sortBy(_._3)
    assert(out.length == 30)
    assert(out.map(_._3).toSeq == (1L to 30L), "ranks must be contiguous")
    // every selected doc is from the target-like half
    assert(out.forall(_._1 <= 30L),
      s"off-target doc selected: ${out.filter(_._1 > 30L).toSeq}")
    // selection is layout-invariant
    val again = Sampling.dsirSelect(raw.repartition(7), target, "doc_id",
      "text", n = 30).as[(Long, Double, Long)].collect().sortBy(_._3)
    assert(out.toSeq == again.toSeq)
  }

  test("doremiWeights: divergent domain up-weighted, uniform corpus flat, mix obeys quotas") {
    // two domains on one vocabulary, one on a disjoint vocabulary: the
    // divergent domain has the most "learnable headroom" (its grams are
    // rare under the corpus mix) and DoReMi must up-weight it
    val df = ((1L to 40L).map(i => ("web", i, "aa ab ac ad aa ab")) ++
      (41L to 80L).map(i => ("news", i, "aa ab ac ad aa ac")) ++
      (81L to 120L).map(i => ("code", i, "zz zy zx zw zv zu")))
      .toDF("source", "doc_id", "text")
    val w = Sampling.doremiWeights(df, "source", "text")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(w.size == 3)
    assert(math.abs(w.values.map(_._2).sum - 1.0) < 1e-4,
      s"weights must sum to 1: $w")
    assert(w("code")._1 > w("web")._1 && w("code")._1 > w("news")._1,
      s"divergent domain must carry the largest excess: $w")
    assert(w("code")._2 > w("web")._2 && w("code")._2 > w("news")._2,
      s"divergent domain must be up-weighted: $w")
    // smoothing floor: no domain below smoothing/K
    assert(w.values.forall(_._2 >= 0.1 / 3 - 1e-9))
    // identical domains ⇒ uniform weights (excess ≈ equal ⇒ softmax flat)
    val flat = Sampling.doremiWeights(
      df.withColumn("text", lit("aa ab ac")), "source", "text")
      .as[(String, Long, Double, Double)].collect()
    assert(flat.forall(r => math.abs(r._4 - 1.0 / 3) < 1e-4), flat.toSeq.toString)
    // layout invariance
    val again = Sampling.doremiWeights(df.repartition(7), "source", "text")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(w == again)
    // the mix: per-domain picks = min(n_d, max(1, floor(N·w_d))), and
    // the draw is the md5 rank — deterministic under repartition
    val mixed = Sampling.doremiMix(df, "source", "doc_id", "text",
      totalTarget = 60).as[(String, Long)].collect()
    val perDom = mixed.groupBy(_._1).view.mapValues(_.length).toMap
    perDom.foreach { case (dom, n) =>
      val expect = math.min(40L, math.max(1L, math.floor(60.0 * w(dom)._2).toLong))
      assert(n.toLong == expect, s"$dom quota: got $n want $expect")
    }
    val mixAgain = Sampling.doremiMix(df.repartition(5), "source", "doc_id",
      "text", totalTarget = 60).as[(String, Long)].collect()
    assert(mixed.toSet == mixAgain.toSet)
  }

  test("temperatureMix flattens head-group dominance as alpha drops") {
    // en 10× de: natural share 10:1; alpha=0.5 should pull toward √10:1
    val df = (1L to 1100L).map(i => (if (i <= 1000) "en" else "de", i))
      .toDF("lang", "id")
    val mixed = Sampling.temperatureMix(df, "lang", "id", 0.5, 300)
      .as[(String, Long)].collect()
    val en = mixed.count(_._1 == "en").toDouble
    val de = mixed.count(_._1 == "de").toDouble
    // expected ratio √(1000/100) ≈ 3.16 — far from the natural 10
    assert(en / de > 2.0 && en / de < 5.0, s"ratio ${en / de}")
    // alpha=1 reproduces the natural distribution (±floor effects)
    val nat = Sampling.temperatureMix(df, "lang", "id", 1.0, 300)
      .as[(String, Long)].collect()
    val enN = nat.count(_._1 == "en").toDouble
    assert(enN / nat.count(_._1 == "de") > 8.0)
    // deterministic under repartitioning
    val again = Sampling.temperatureMix(df.repartition(7), "lang", "id", 0.5, 300)
      .as[(String, Long)].collect()
    assert(mixed.toSet == again.toSet)
    // never exceeds a group's size, never empties a group
    val tiny = Sampling.temperatureMix(df.filter($"id" > 995), "lang", "id", 0.5, 1000)
    assert(tiny.count() == 105)
  }

  test("quality checks count violations and pass on clean data") {
    val dirty = Seq((1L, Some(10.0)), (1L, Some(20.0)), (2L, None), (3L, Some(99.0)))
      .toDF("id", "v")
    val parent = Seq(1L, 2L).toDF("pid")
    val rpt = Quality.report(Seq(
      Quality.uniqueCheck(dirty, Seq("id"), "id_unique"),
      Quality.notNullCheck(dirty, "v", "v_not_null"),
      Quality.rangeCheck(dirty, "v", 0.0, 50.0, "v_range"),
      Quality.fkCheck(dirty, "id", parent, "pid", "id_fk")))
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(rpt("id_unique") == (1L, false))  // id 1 twice
    assert(rpt("v_not_null") == (1L, false)) // one null
    assert(rpt("v_range") == (1L, false))    // 99.0 out of range
    assert(rpt("id_fk") == (1L, false))      // id 3 has no parent
    val clean = Quality.uniqueCheck(parent, Seq("pid"), "ok")
      .as[(String, Long, Boolean)].head()
    assert(clean == ("ok", 0L, true))
  }

  test("approx_count_distinct lands within 5% of exact on real data") {
    val li = graft.core.Tables.lineitem(spark, sf)
    val (exact, approx) = li.agg(
      countDistinct($"l_partkey").cast("double"),
      approx_count_distinct($"l_partkey").cast("double"))
      .as[(Double, Double)].first()
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("PSI: identical distributions score ~0, shifted distributions > 0") {
    val base = (1 to 1000).map(_.toDouble).toDF("v")
    val same = Psi.psi(base, base, "v").as[Double].first()
    assert(math.abs(same) < 1e-9)
    val shifted = (501 to 1500).map(_.toDouble).toDF("v")
    val drift = Psi.psi(base, shifted, "v").as[Double].first()
    assert(drift > 0.5, s"expected large PSI, got $drift")
  }

  test("pctHexThreshold is the exact base-16 expansion of pct/100") {
    assert(Sampling.pctHexThreshold(20) == "3" * 32)  // 0.2 = 0x0.333…
    assert(Sampling.pctHexThreshold(25) == "4" + "0" * 31)
    assert(Sampling.pctHexThreshold(50) == "8" + "0" * 31)
    assert(Sampling.pctHexThreshold(0) == "0" * 32)
    assert(Sampling.pctHexThreshold(100) == "g") // above every hex digest
  }

  test("portableTestMember membership equals an independent md5 recompute") {
    // the contract r2's DuckDB oracle relies on: any engine reproduces
    // the member SET from md5(key || salt) < hex-threshold
    val md = java.security.MessageDigest.getInstance("MD5")
    def ref(key: Long): Boolean = {
      val hex = md.digest(s"${key}split".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      hex < Sampling.pctHexThreshold(20)
    }
    val keys = (1L to 500L)
    val got = keys.toDF("k")
      .select($"k", Sampling.portableTestMember($"k", 20, "split").as("t"))
      .as[(Long, Boolean)].collect().toMap
    keys.foreach(k => assert(got(k) == ref(k), s"key $k"))
  }

  test("hashSplit: disjoint, exhaustive, ~pct test fraction, repartition-stable") {
    val df = (1L to 5000L).toDF("id")
    val (train, test) = Sampling.hashSplit(df, "id", testPct = 20)
    val nTrain = train.count(); val nTest = test.count()
    assert(nTrain + nTest == 5000L)
    assert(math.abs(nTest / 5000.0 - 0.20) < 0.03, s"test fraction ${nTest / 5000.0}")
    val (_, test2) = Sampling.hashSplit(df.repartition(7), "id", testPct = 20)
    assert(test2.select("id").as[Long].collect().sorted.toSeq ==
      test.select("id").as[Long].collect().sorted.toSeq)
  }

  test("leakageFreeSplit: exact-dup groups never straddle the split") {
    // 200 distinct texts, each in 1-3 reformatting copies (canonical
    // fingerprint collapses case/whitespace) under distinct ids — an
    // id-keyed split WOULD scatter these across sides
    val docs = (1 to 200).flatMap { g =>
      val base = s"document about topic $g with shared phrasing"
      Seq((g * 10L, base)) ++
        (if (g % 2 == 0) Seq((g * 10L + 1, base.toUpperCase)) else Nil) ++
        (if (g % 3 == 0) Seq((g * 10L + 2, s"  ${base.replace(" ", "  ")} ")) else Nil)
    }.toDF("doc_id", "text")
    val out = Sampling.leakageFreeSplit(docs, "text", testPct = 25)
    assert(out.count() == docs.count(), "split adds a column, drops nothing")
    val straddle = out
      .groupBy(graft.operators.TextAnalysis.fingerprint($"text").as("fp"))
      .agg(countDistinct($"split").as("sides"))
      .filter($"sides" > 1).count()
    assert(straddle == 0, s"$straddle fingerprint groups straddle the split")
    // both sides populated, and the copies follow their group's side
    val sides = out.select("split").distinct().as[String].collect().toSet
    assert(sides == Set("train", "test"))
    // repartition-stable (pure per-row expressions)
    val again = Sampling.leakageFreeSplit(docs.repartition(7), "text", 25)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    out.select("doc_id", "split").as[(Long, String)].collect()
      .foreach { case (id, sp) => assert(again(id) == sp) }
  }

  test("leakageFreeSplitNearDup: whole clusters land on one side") {
    // pair graph: {1,2,3} chained, {10,11} paired, 20/21 singletons
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Sampling.leakageFreeSplitNearDup(docs, pairs, "doc_id", 50)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
    val byCluster = out.groupBy(_._2)
    // every cluster is wholly train or wholly test — the near-dup
    // leakage channel an id-keyed (or exact-fp) split leaves open
    byCluster.foreach { case (cl, rows) =>
      assert(rows.map(_._3).distinct.length == 1,
        s"cluster $cl straddles the split: ${rows.toSeq}")
    }
    assert(byCluster(1L).map(_._1).toSet == Set(1L, 2L, 3L))
    assert(byCluster(10L).map(_._1).toSet == Set(10L, 11L))
    // singletons key on their own id (their component label)
    assert(byCluster(20L).map(_._1).toSeq == Seq(20L))
    assert(out.length == 7, "split adds columns, drops nothing")
  }

  test("unimaxCensus: capped languages redistribute, equal share binds the rest") {
    // three languages: tiny (10 docs x 4 toks = 40), mid (100 x 4 =
    // 400), big (1000 x 4 = 4000); maxEpochs 2 -> caps 80/800/8000
    def docs(lang: String, n: Int, off: Long) =
      (1 to n).map(i => (off + i, lang, "just four short tokens"))
    val df = (docs("aa", 10, 0L) ++ docs("bb", 100, 1000L) ++
      docs("cc", 1000, 10000L)).toDF("doc_id", "lang", "text")
    val out = Sampling.unimaxCensus(df, "doc_id", "lang", "text",
        budgetTokens = 2000L, maxEpochs = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // water filling ascending: aa share 2000/3=666 -> capped at 80;
    // bb share (2000-80)/2=960 -> capped at 800; cc gets the rest 1120
    assert(out("aa") == ((80L, 80L, 20L, 80L)),
      s"tiny lang caps at 2 epochs, got ${out("aa")}")
    assert(out("bb") == ((800L, 800L, 200L, 800L)))
    assert(out("cc")._2 == 1120L, s"residual flows to the big lang: ${out("cc")}")
    // cc selection: 1120/4000 = 0 full epochs, prefix 1120/4 = 280 docs
    assert(out("cc")._3 == 280L && out("cc")._4 == 1120L)
    // budget exhausted exactly (nothing capped it short)
    assert(out.values.map(_._2).sum == 2000L)
    // ample budget: every language caps out at exactly maxEpochs
    val ample = Sampling.unimaxCensus(df, "doc_id", "lang", "text",
        budgetTokens = 100000L, maxEpochs = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
    ample.foreach { case (cap, alloc, tok) =>
      assert(alloc == cap && tok == cap, "epoch limit binds under ample budget")
    }
    // deterministic under repartitioning (md5 rank, integer math)
    val again = Sampling.unimaxCensus(df.repartition(7), "doc_id", "lang",
      "text", budgetTokens = 2000L, maxEpochs = 2)
    assert(again.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      .forall { case (l, n) => out(l)._3 == n })
  }

  test("scd2History: intervals, change suppression, null-safe tracking") {
    val snaps = Seq(
      // key 1: value changes every version → 3 intervals
      (1L, 1, Some("a")), (1L, 2, Some("b")), (1L, 3, Some("c")),
      // key 2: v2 re-lands the SAME value (suppressed), v3 changes —
      // the v1 interval must run [1, 3), not fragment at 2
      (2L, 1, Some("x")), (2L, 2, Some("x")), (2L, 3, Some("y")),
      // key 3: null → null is NOT a change (null-safe compare);
      // null → value is
      (3L, 1, None), (3L, 2, None), (3L, 3, Some("z")))
      .toDF("k", "version", "v")
    val h = Scd.scd2History(snaps, Seq("k"), "version", Seq("v"))
      .select("k", "valid_from", "valid_to", "is_current")
      .as[(Long, Int, Option[Int], Int)].collect().toSet
    assert(h == Set(
      (1L, 1, Some(2), 0), (1L, 2, Some(3), 0), (1L, 3, None, 1),
      (2L, 1, Some(3), 0), (2L, 3, None, 1),
      (3L, 1, Some(3), 0), (3L, 3, None, 1)))
  }

  test("lengthBucketBatches: bit-length buckets, pad ceiling, rank div batch") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a"),                 // 1 tok  → bucket 1, pad 1
      (2L, "a b"),               // 2      → bucket 2, pad 3
      (3L, "a b c"),             // 3      → bucket 2
      (4L, "a b c d"),           // 4      → bucket 3, pad 7
      (5L, "a b c d e f g h"),   // 8      → bucket 4, pad 15
      (6L, "x  y"),              // empty tokens filtered → 2 → bucket 2
      (7L, "   "))               // 0 floored to 1 → bucket 1
      .toDF("doc_id", "text")
    val out = graft.ops.Sampling
      .lengthBucketBatches(docs, "doc_id", "text", batchSize = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1L, 1L, 1L, 0L)))
    assert(out(7L) == ((7L, 1L, 1L, 1L, 0L)))
    assert(out(2L) == ((2L, 2L, 2L, 3L, 0L)))
    assert(out(3L) == ((3L, 3L, 2L, 3L, 0L)))
    assert(out(6L) == ((6L, 2L, 2L, 3L, 1L))) // 3rd in bucket 2 → batch 1
    assert(out(4L) == ((4L, 4L, 3L, 7L, 0L)))
    assert(out(5L) == ((5L, 8L, 4L, 15L, 0L)))
  }
}
