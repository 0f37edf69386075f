package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Scaling-evidence main: replicates the documents corpus N× (distinct
  * ids via offset, text salted per replica so replicas are not trivial
  * exact dups) and times the dedup/text family at growing corpus sizes
  * on the SAME hardware. A near-linear curve is the empirical check
  * behind the "no quadratic blowup" design claims (banded LSH joins,
  * capped shingle buckets, payload-free shuffles); an operator whose
  * cost bends upward faster than the corpus grows is a scale bug even
  * if its absolute seconds look small.
  *
  * Usage: ScaleProbe [replication factors, default "1 2 5 10"], input
  * from SPARK_GRAFT_SF_DIR (default sf0.1). Prints one JSON line per
  * factor: {"n":N,"docs":D,"queries":{op:sec,...}}.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factors = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 2, 5, 10)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val baseN = base.count()

    def replicated(n: Int): DataFrame =
      if (n == 1) base
      else (0 until n).map { r =>
        // offset ids into disjoint ranges; salt the text so replicas are
        // near-dups of each other only where the base corpus already
        // had planted dups (keeps pair counts ~linear in n, like a real
        // crawl growing by new-but-similarly-duplicated content)
        base.select((col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" replica$r")).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)

    // mostly-novel eval docs (disjoint gram space via token prefixing,
    // ids offset into their own range) + a small verbatim corpus slice
    // as planted contamination
    def evalMix(d: DataFrame): DataFrame =
      d.filter(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 500000000L).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", "ev_$1").as("text"))
        .unionByName(
          d.filter(col("doc_id") % 997 === 0).select("doc_id", "text"))

    val allOps: Seq[(String, DataFrame => DataFrame)] = Seq(
      "d1_exact" -> (d => Dedup.exactDedup(d, "doc_id", "text")),
      // BM25 with a FIXED query set (base replica only — replica ids
      // offset by 10 M, not a multiple of 9973, so an unrestricted
      // mod-filter would GROW the query set with the replication
      // factor and bend the curve for a harness reason): postings
      // volume (tf rows) grows linearly and the per-term join work is
      // posting-list-sized, so the curve must be linear; the synthetic
      // 31-word vocab makes posting lists corpus-length — the WORST
      // skew case, every term a hot key (real vocabularies spread far
      // thinner)
      "t46_bm25" -> { d =>
        val q = d.filter(col("doc_id") % 9973 === 0 &&
            col("doc_id") < 10000000L)
          .select(col("doc_id").as("q_id"),
            substring(col("text"), 1, 60).as("q_text"))
        graft.operators.TextAnalysis.bm25TopK(d, q, k = 5, maxDfRatio = 1.0)
      },
      // hybrid retrieval (the llm_hybrid_retrieval composite): the BM25
      // run + the exact vector run + the RRF full-outer fuse, FIXED
      // 7-query set on the base replica. Both runs are linear in the
      // corpus with fixed queries (postings join / one broadcast-query
      // scan); the fuse is queries×k rows — the curve must be linear
      "llm_hybrid" -> { d =>
        val q = d.filter(col("doc_id") % 83 === 0 && col("doc_id") < 500)
        val lex = graft.operators.TextAnalysis.bm25TopK(d,
          q.select(col("doc_id").as("q_id"),
            substring(col("text"), 1, 60).as("q_text")),
          k = 20, maxDfRatio = 1.0)
        def embed(df: DataFrame): DataFrame = df.select(
          col("doc_id").as("vec_id"),
          transform(sequence(lit(0), lit(7)), i =>
            pmod(length(col("text")) * 31 + col("doc_id") * 17 + i * 7,
              lit(97)).cast("float")).as("embedding"))
        val vec = graft.operators.Similarity.bruteForceTopK(
          embed(d), embed(q), 20)
        graft.operators.Similarity.rrfFuse(lex, vec, k = 5)
      },
      // prompt-level SFT dedup (t45's per-batch kernel): chat render
      // over conv groups, then the prompt-fp keeper election — one
      // conversation agg + one fp agg + a semi join, all key-partitioned;
      // the curve must be linear. (The STREAMING form adds Spark's
      // state-store lookups, bounded per micro-batch by in-flight keys —
      // runtime-owned, not an engine term.)
      "t45_sft_dedup" -> { d =>
        val W = org.apache.spark.sql.expressions.Window
        val turns = d.select(floor(col("doc_id") / 13).cast("long").as("conv_id"),
            col("doc_id").as("ord"), substring(col("text"), 1, 120).as("t"))
          .withColumn("role",
            when(row_number().over(
              W.partitionBy("conv_id").orderBy("ord")) % 2 === 1, "user")
              .otherwise("assistant"))
        graft.operators.Instruction.dedupByPrompt(
          graft.operators.Instruction.renderChat(
            turns, "conv_id", "ord", "role", "t"))
      },
      // chat render: ONE conversation-keyed aggregation over groups of
      // ≤13 turns (conv = doc_id div 13 — replica offsets keep conv ids
      // disjoint, conv COUNT scales with the corpus while group size
      // stays fixed) — the curve must be linear, map-side dominated
      "t43_chat_render" -> { d =>
        val W = org.apache.spark.sql.expressions.Window
        val turns = d.select(floor(col("doc_id") / 13).cast("long").as("conv_id"),
            col("doc_id").as("ord"), substring(col("text"), 1, 120).as("t"))
          .withColumn("role",
            when(row_number().over(
              W.partitionBy("conv_id").orderBy("ord")) % 2 === 1, "user")
              .otherwise("assistant"))
        graft.operators.Instruction.renderChat(turns, "conv_id", "ord", "role", "t")
      },
      // d1's reweighting twin: the count aggregate is the same shape,
      // but every row flows back through the fp join — the curve
      // should track d1's with a constant payload-join premium
      "d28_soft_dedup" -> (d =>
        graft.operators.Dedup.softDedupWeights(d, "doc_id", "text")
          .agg(sum(col("n_copies")).as("nc"),
            sum(col("soft_weight")).as("sw"))
          .filter(col("nc") >= 0)),
      // registered-domain + blocklist + occurrence score: pure map-side
      // work plus one broadcast join — the flattest curve on the board
      "t39_url_filter" -> { d =>
        val spark = d.sparkSession
        import spark.implicits._
        val urls = d.select(col("doc_id"),
          concat(lit("https://site"), (col("doc_id") % 997).cast("string"),
            lit(".com/p"), (col("doc_id") % 50).cast("string"),
            when(col("doc_id") % 13 === 0, lit("/casino"))
              .otherwise(lit(""))).as("url"))
        graft.operators.TextAnalysis.urlFilter(urls, "doc_id", "url",
            Seq("site1.com", "site2.com").toDF("domain"), Seq("casino"))
          .agg(sum(col("url_score")).as("s"),
            count(when(col("keep"), 1)).as("k"))
          .filter(col("s") >= 0)
      },
      "d2_minhash_lsh" -> (d => Dedup.minHashLshDedup(d, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.8)),
      "d3_simhash" -> (d => Dedup.simHashPairs(
        Dedup.simHash(d, "doc_id", "text"), 6)),
      "d4_jaccard_capped" -> (d => Dedup.jaccardPairs(
        Dedup.shingles(d, "doc_id", "text", 3), 0.8, maxDocFreq = Some(100))),
      // the size-ROUTED entry point: exact ≤ 10 k docs, MinHash+LSH above —
      // its row should track d4 at the base corpus and flat-line to d2
      // where d4 widens
      "d4_routed_neardup" -> (d => Dedup.nearDupPairs(d, "doc_id", "text",
        shingleSize = 3, threshold = 0.8, maxDocFreq = Some(100))),
      // positional-gram coverage: one distinct+aggregate and one semi
      // join over 8-byte gram hashes — should track corpus size, not
      // bend upward with duplication
      "d9_dup_spans" -> (d => Dedup.dupSpanCoverage(d, "doc_id", "text",
        n = 5, minDocs = 2)),
      // the removal twin of d9: same gram machinery plus a duplicated-
      // occurrence join and the per-doc rewrite — the extra cost over
      // d9 should stay a constant factor, not a new curve shape. The
      // 1-row aggregate over clean_text defeats count()'s column
      // pruning, and the value-dependent filter defeats count()'s
      // CONSTANT-FOLD over an ungrouped aggregate (Spark knows such an
      // agg is exactly one row and would answer 1 without running the
      // rewrite at all — measured: 13.8 s of real work "completing" in
      // 0.2 s before the filter was added)
      "d13_dedup_rewrite" -> (d => Dedup.removeDupSpans(d, "doc_id", "text",
        n = 5).agg(sum(length(col("clean_text"))).as("chars_kept"),
          sum(col("n_kept")).as("toks_kept"))
        .filter(col("chars_kept") >= 0)),
      // the CHAR-granular twin: ~wordLen× more gram rows than d13 by
      // design — the probe pins that the premium is a constant factor
      // (linear in corpus chars), not a new curve shape; same
      // anti-pruning aggregate + anti-fold filter
      "d18_char_rewrite" -> (d => Dedup.removeDupSpansChars(d, "doc_id",
        "text", n = 20)
        .agg(sum(length(col("clean_text"))).as("chars_kept"),
          sum(col("n_kept")).as("chars_kept_n"))
        .filter(col("chars_kept") >= 0)),
      // per-source boilerplate: one map-side-combinable (source, gram)
      // count + a broadcast semi-join — replicas salt their text per
      // replica, so each replica block is its own boilerplate regime
      // and the curve should track corpus size like d13's
      "d19_boilerplate" -> (d => Dedup.removeBoilerplate(d, "doc_id",
        "text", "source", n = 5, minDocs = 3)
        .agg(sum(length(col("clean_text"))).as("chars_kept"),
          sum(col("n_kept")).as("toks_kept"))
        .filter(col("chars_kept") >= 0)),
      // batch-vs-corpus near-dup: the batch (1/5 of docs) rides LSH
      // buckets against the corpus — cost should track corpus size
      // linearly (bucket join), never corpus²
      "d10_incremental" -> (d => Dedup.incrementalNearDup(
        d.filter(col("doc_id") % 5 === 0), d.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text")),
      // span-level decontamination rewrite: broadcast eval-gram
      // semi-join + per-doc rebuild — the curve must track corpus size
      // (the probe side is map-side); the rewrite's premium over t10's
      // flag path is a constant factor, not a new shape. Same
      // anti-column-pruning aggregate as d13.
      "t15_decontam_rewrite" -> (d => Dedup.decontaminateRewrite(
        d, evalMix(d), "doc_id", "text", n = 5)
        .agg(sum(length(col("clean_text"))).as("chars_kept"),
          sum(col("n_kept")).as("toks_kept"))
        .filter(col("chars_kept") >= 0)),
      // the size-routed rewrite FORCED onto its Bloom route, against
      // t15's broadcast row above on the same corpus: the premium for
      // flag-first (Bloom build + verify + a second corpus pass for
      // the passthrough) buys a gram-explosion stage bounded by the
      // CONTAMINATED sliver — on this mostly-novel eval mix the routed
      // curve should flatten vs t15 as replication grows duplication
      "t19_decontam_auto_bloom" -> (d => Dedup.decontaminateRewriteAuto(
        d, evalMix(d), "doc_id", "text", n = 5, maxBroadcastGrams = 0L)
        .agg(sum(length(col("clean_text"))).as("chars_kept"),
          sum(col("n_kept")).as("toks_kept"))
        .filter(col("chars_kept") >= 0)),
      // canonical dedup rides the same (id, fp) exchanges as d1 — the
      // canonicalization is map-side regex work, so the curve should
      // sit a hair above d1_exact and bend nowhere
      "d17_canonical" -> (d => Dedup.canonicalExactDedup(
        d, "doc_id", "text")),
      "t2_quality" -> (d => d.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text"),
          Seq("the", "a", "of", "and", "is", "to", "in")).as("q"))),
      "t5_tfidf" -> (d => TextAnalysis.tfIdf(d, "doc_id", "text")),
      // decontamination twins on a REALISTIC overlap profile: the eval
      // side is mostly-novel grams (every token prefixed — a benchmark
      // suite shares few n-grams with a crawl) plus a small verbatim
      // corpus slice (%997) as the planted contamination. Both sides
      // grow with n. The exact path broadcasts the ENTIRE eval gram
      // table row-wise (mostly useless entries); the bloom path ships
      // ~1.8 bytes/gram of bits and prunes corpus grams map-side down
      // to the planted-hit sliver. NOTE (measured, round 8): on an
      // overlap-DENSE fixture (eval ⊂ corpus verbatim) bloom prunes
      // nothing and its sketch+verify overhead LOSES 4.6× at 50 k docs
      // — bloom decontam is for the sparse-overlap regime, which is
      // what production decontamination is
      "t10_exact_decontam" -> (d => Dedup.contaminationPairs(
        d, evalMix(d), "doc_id", "text", 3)),
      "t14_bloom_decontam" -> (d => Dedup.bloomContaminationPairs(
        d, evalMix(d), "doc_id", "text", 3)),
      // one-pass counter-map sketch over the exploded token stream —
      // the curve must track token count (map work), not distinct
      // vocabulary (which the exact groupBy side also pays here; the
      // probe times sketch + exact hot-list join as registered)
      "a11_heavy_hitters" -> (d => graft.queries.Relational.heavyHitters(
        d.select(explode(split(trim(col("text")), "\\s+")).as("tok")),
        "tok", 0.01)),
      // doc-local sorted-run n-gram coverage over 9 gram sizes — pure
      // map pass, ZERO exchange; must track corpus size exactly (the
      // anti-fold filter defeats count()'s constant-fold, gotcha 24)
      "t20_gopher" -> (d => TextAnalysis.gopherRules(d, "doc_id", "text")
        .agg(sum(col("n_words")).as("w"), sum(col("keep")).as("k"))
        .filter(col("w") >= 0)),
      // DSIR: two ≤256-row distribution aggregates + one map-side
      // scoring pass + distributed TakeOrdered — the curve must track
      // corpus size with no bend from the top-n
      "r8_dsir" -> (d => graft.ops.Sampling.dsirSelect(
        d, d.filter(col("source") === "src0"), "doc_id", "text", n = 100)),
      // BPE train + encode: training is ONE capped word-count aggregate
      // (Heaps bounds the dictionary) + a driver merge loop over ≤50 k
      // entries — corpus-size-independent past the count; encode is the
      // native kernel whose per-distinct-word memo makes Zipf pay per
      // TYPE. The curve must track token count linearly with no bend
      // from vocabulary growth. Same anti-fold aggregate as d13.
      "t21_bpe_train_encode" -> { d =>
        val merges = TextAnalysis.trainBpe(d, "text", numMerges = 200)
        d.select(graft.plans.GraftFunctions.bpeEncode(
            d.sparkSession, col("text"), merges).as("_p"))
          .agg(sum(size(col("_p"))).as("pieces"))
          .filter(col("pieces") >= 0)
      },
      // corpus card AFTER the skew-immune dup count (groupBy+join-back
      // replacing the _fp window): one map pass + a map-side-combinable
      // fp count + the groups-sized card aggregate. The aggregate over
      // card columns defeats group-key-only pruning (a bare count()
      // would let Catalyst skip the quality/token math).
      "t22_corpus_card" -> (d => TextAnalysis.corpusCard(d, "doc_id",
        "text", "source", "lang",
        Seq("the", "a", "of", "and", "is", "to", "in"))
        .agg(sum(col("n_docs")).as("docs"), sum(col("dup_docs")).as("dups"))
        .filter(col("docs") >= 0)),
      // CCNet bigram LM, single-corpus: two capped count aggregates
      // over exploded grams + a broadcast-join scoring pass — the
      // gram explode is the heaviest new map cost of round 12 and
      // must track token count linearly (model tables are capped, so
      // their broadcast cost is flat)
      "t24_bigram_lm" -> (d => TextAnalysis.bigramLogProb(
        d, "doc_id", "text")
        .agg(sum("n_bigrams").as("bg"), sum("avg_logp").as("s"))
        .filter(col("bg") >= 0)),
      // the full CCNet composite: target-trained model (src0 slice) +
      // cross-corpus scoring + per-lang integer thirds — adds one
      // skinny window over (id, lang, score) to t24's shape
      "llm_ccnet" -> (d => TextAnalysis.ccnetBuckets(
        TextAnalysis.bigramLogProbAgainst(
          d.filter(col("source") === "src0"), d, "doc_id", "text")
          .join(d.select(col("doc_id").as("id"), col("lang")), "id"),
        "lang", "avg_logp", "id")
        .groupBy("lang", "bucket").agg(count(lit(1)).as("n"))
        .agg(sum("n").as("docs")).filter(col("docs") >= 0)),
      // store-backed decontamination: eval-gram store write + Bloom
      // probe + exact verify + interval rewrite — the probe prunes
      // clean docs map-side, so the curve must track t15's, store
      // write included
      "t23_store_decontam" -> { d =>
        val dir = java.nio.file.Files
          .createTempDirectory("probeevalgram").toString
        Dedup.writeEvalGramStore(evalMix(d), "text", dir, n = 5)
        Dedup.decontaminateRewriteFromStore(d, dir, "doc_id", "text")
          .agg(sum(length(col("clean_text"))).as("chars_kept"),
            sum(col("n_kept")).as("toks_kept"))
          .filter(col("chars_kept") >= 0)
      },
      // release gate: two one-scan card+quality projections, two
      // groups-sized aggregates, one PSI — flat beyond the scans
      "m15_release_gate" -> (d => graft.metrics.ReleaseGate.snapshotGate(
        d.filter(col("doc_id") % 3 =!= 0), d.filter(col("doc_id") % 3 === 0),
        "doc_id", "text", "source", "lang",
        Seq("the", "a", "of", "and", "is", "to", "in"))
        .agg(sum("n_docs_e").as("ne"), sum("accept").as("acc"))
        .filter(col("ne") >= 0)),
      // the PATHOLOGICAL card: one text duplicated 100 000× on top of
      // the corpus. Under the old _fp window every copy landed in ONE
      // window partition (single-task straggler growing with the dup
      // block); the count+join-back partial-aggregates the block to one
      // (fp, count) row, so this row must sit a near-constant premium
      // over t22_corpus_card with no straggler bend.
      "t22_card_pathological" -> { d =>
        val pathText = "the same boilerplate page fetched over and over again"
        val path = d.sparkSession.range(100000).select(
          (col("id") + 900000000L).as("doc_id"),
          lit(pathText).as("text"),
          lit("xx").as("lang"), lit("src_path").as("source"),
          lit(pathText.length.toLong).as("n_chars"))
        TextAnalysis.corpusCard(d.unionByName(path), "doc_id",
          "text", "source", "lang",
          Seq("the", "a", "of", "and", "is", "to", "in"))
          .agg(sum(col("n_docs")).as("docs"), sum(col("dup_docs")).as("dups"))
          .filter(col("docs") >= 0)
      },
      // the distributed per-language rank under pathological language
      // skew: 90% of docs forced into ONE language. The old
      // partitionBy(lang) window single-tasked the dominant slice (a
      // straggler growing with the corpus); the range-partitioned rank
      // bounds every sort by corpus-size/parallelism, so this row must
      // track corpus size with no skew bend. Score is a cheap hash
      // value — the probe measures the RANK shape, not LM scoring.
      "ccnet_rank_skew" -> (d => TextAnalysis.ccnetBuckets(
        d.select(col("doc_id").as("id"),
          when(col("doc_id") % 10 < 9, "en").otherwise(col("lang")).as("lang"),
          pmod(xxhash64(col("doc_id")), lit(100000)).cast("double").as("s")),
        "lang", "s", "id")
        .groupBy("lang", "bucket").agg(count(lit(1)).as("n"))
        .agg(sum("n").as("docs")).filter(col("docs") >= 0)),
      // the split-hygiene pair generator on its SCALE route: multi-seed
      // over-banded LSH (analytic miss ≤ 1e-7) + component labeling +
      // the per-row cluster-keyed split — must stay flat-to-linear
      // where the exact pair pass (d4_jaccard_capped row) bends
      "r11_split_lsh" -> (d => graft.ops.Sampling.leakageFreeSplitNearDup(
        d.select("doc_id"),
        Dedup.lshPairsMultiSeed(d, "doc_id", "text", shingleSize = 3,
          threshold = 0.8, missBound = 1e-7),
        "doc_id", 25)
        .groupBy("split").agg(count(lit(1)).as("n"))
        .agg(sum("n").as("docs")).filter(col("docs") >= 0)),
      // Heaps curve: a skinny id-only rank + boundary collect, then
      // ONE (token, bucket) min-aggregate — the curve must track
      // token count; the boundary collect is ≤ numBuckets rows at
      // any corpus size
      "t32_vocab_growth" -> (d => TextAnalysis.vocabGrowth(
        d, "doc_id", "text", numBuckets = 10)),
      // HTML extraction is a pure map (regexp chain, zero exchange):
      // the flattest possible row, priced per corpus char. Wrap the
      // text in markup first so the chain has real work per doc.
      "t33_html_strip" -> (d => TextAnalysis.htmlToText(
        d.select(col("doc_id"), concat(
          lit("<html><head><title>t</title><script>var x = 1 < 2;" +
            "</script></head><body><p>"), col("text"),
          lit("</p><!-- c --><a href=\"u\">l</a></body></html>"))
          .as("h")), "doc_id", "h")
        .agg(sum(length(col("text"))).as("chars"), sum("n_links").as("lk"))
        .filter(col("chars") >= 0)),
      // URL canonicalization (map-side regex) + keep-latest window:
      // canonical keys are ~unique per page (groups = re-crawl
      // counts, here ≤ ~n), so the window shuffle is skinny and the
      // curve must track corpus size
      "d22_url_dedup" -> (d => Dedup.latestPerUrl(
        d.select(col("doc_id"),
          concat(lit("https://www.s"), (col("doc_id") % 100000).cast("string"),
            lit(".com/p"), (col("doc_id") % 977).cast("string"),
            lit("?utm_x=1&v="), (col("doc_id") % 7).cast("string")).as("url"),
          (col("doc_id") % 97).as("ts")),
        "url", "ts", "doc_id")
        .agg(sum("n_crawls").as("c")).filter(col("c") >= 0)),
      // length-bucket batching: a map-side token count + the
      // distributed multi-group rank over ~15 Zipf-heavy buckets —
      // the dominant-bucket shape the range rank exists for; must
      // track corpus size with no skew bend
      "r14_length_buckets" -> (d => graft.ops.Sampling.lengthBucketBatches(
        d, "doc_id", "text", batchSize = 1024)
        .agg(sum("batch_idx").as("b"), sum("n_tok").as("t"))
        .filter(col("t") >= 0)),
      // the routed quota draw under pathological domain skew: 90% of
      // rows forced into ONE source (the DoReMi CommonCrawl shape, the
      // quota/temperature-mix language shape). The old per-group
      // md5-rank window single-tasked the dominant domain — a straggler
      // growing with the corpus; the round-14 DistributedRank routing
      // bounds every sort by range-partition size, so this row must
      // track corpus size with no skew bend. Skinny (source, id)
      // projection — the draw ranks keys, text never enters.
      "quota_draw_skew" -> (d => graft.ops.Sampling.quotaSample(
        d.select(col("doc_id"),
          when(col("doc_id") % 10 < 9, "cc")
            .otherwise(col("source")).as("source")),
        "source", "doc_id", 1000)
        .agg(count(lit(1)).as("n")).filter(col("n") >= 0)),
      // fuzzy (near-dup) eval decontamination against a FIXED suite
      // (benchmarks don't grow with the crawl): banded cross-set LSH
      // candidates + exact verify with eval as the tiny side — the
      // curve must track corpus size; the flagged sliver grows
      // linearly (every replica re-plants the base's %97 near-dups —
      // the one-salt-token texts stay above the 0.8 jaccard bar),
      // never corpus × eval
      "t35_fuzzy_decontam" -> (d => Dedup.fuzzyDecontaminate(d,
        base.filter(col("doc_id") % 97 === 0)
          .select((col("doc_id") + 500000000L).as("doc_id"),
            concat(col("text"), lit(" extra")).as("text")),
        "doc_id", "text")
        .agg(sum(col("contaminated")).as("n_flagged"),
          sum(col("eval_jaccard")).as("js"))
        .filter(col("n_flagged") >= 0)),
      // ---- flagship composites (round-17 verdict #6): each CHAINS
      // many already-probed operators end to end, so these rows pin
      // that the COMPOSITION introduces no super-linear seam (an
      // unintended re-shuffle between stages, a lineage re-run the
      // single-op rows never see). Fixed selection targets
      // (temperature 300 / quota 40) keep the tail stages flat while
      // the dedup/decontam/score heads track corpus size.
      "llm_pretrain" -> { d =>
        val deduped = Dedup.exactDedup(d, "doc_id", "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val contaminated = Dedup.contaminationPairs(
            deduped, evalMix(d), "doc_id", "text", 3)
          .filter(col("shared") >= 2)
          .select(col("id").as("doc_id")).distinct()
        val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
        val mixed = graft.ops.Sampling.temperatureMix(
          clean, "lang", "doc_id", 0.5, 300)
        TextAnalysis.chunkDocuments(mixed, "doc_id", "text", 32, 24,
            carry = Seq("lang"))
          .groupBy("lang")
          .agg(countDistinct(col("id")).as("n_docs"),
            count(lit(1)).as("n_chunks"), sum("n_tokens").as("chunk_tokens"))
      },
      "llm_corpus" -> { d =>
        val deduped = Dedup.exactDedup(d, "doc_id", "text")
        val filtered = deduped
          .withColumn("q", TextAnalysis.qualityScore(col("text"),
            Seq("the", "a", "of", "and", "is", "to", "in")))
          .withColumn("rep", TextAnalysis.repetitionRatio(col("text")))
          .filter(col("q") >= 0.4 && col("rep") < 0.5)
        val sampled = graft.ops.Sampling.quotaSample(
          filtered, "lang", "doc_id", 40)
        TextAnalysis.packSequences(sampled, "doc_id", "text",
            budget = 256, shards = 4, carry = Seq("lang"))
          .groupBy("lang", "shard")
          .agg(count(lit(1)).as("n_docs"), max("chunk_id").as("max_chunk"),
            sum("n_tokens").as("tok_total"))
      },
      "llm_web" -> { d =>
        // the web-ingest composite: t33's extraction + d22's canonical
        // latest-crawl dedup + t30's entropy cut, chained on one lineage
        val pages = d.select(col("doc_id"),
          concat(lit("<html><head><title>t</title><script>var x = 1 < 2;" +
              "</script></head><body><p>"), col("text"),
            lit("</p><!-- c --><a href=\"u\">l</a></body></html>")).as("h"),
          concat(lit("https://www.s"), (col("doc_id") % 100000).cast("string"),
            lit(".com/p"), (col("doc_id") % 977).cast("string")).as("url"),
          (col("doc_id") % 97).as("fetch_ts"))
        val latest = Dedup.latestPerUrl(
          TextAnalysis.htmlToText(pages, "doc_id", "h"),
          "url", "fetch_ts", "doc_id")
        val ent = graft.plans.GraftFunctions.charEntropy(
          d.sparkSession, col("text"))
        latest
          .select(col("doc_id"), col("n_crawls"),
            (round(ent, 6) >= 2.85).cast("int").as("keep"))
          .agg(sum("n_crawls").as("c"), sum("keep").as("k"))
          .filter(col("c") >= 0)
      })

    // SPARK_GRAFT_PROBE_OPS: comma-separated op-name filter, so a
    // targeted re-probe needn't pay the whole battery (the capped exact
    // jaccard row alone is ~108 s at 10×)
    val ops = sys.env.get("SPARK_GRAFT_PROBE_OPS") match {
      case Some(list) =>
        val want = list.split(",").map(_.trim).toSet
        allOps.filter { case (name, _) => want(name) }
      case None => allOps
    }

    // SPARK_GRAFT_PROBE_MODE=evalsweep: hold the corpus FIXED (2×) and
    // sweep the EVAL side — the decontam twins' separating dimension is
    // eval gram volume (the exact path's broadcast), not corpus size.
    // Each factor k replicates the novel-eval slice k× with per-replica
    // token salting (distinct gram space per replica), keeping the
    // planted verbatim slice constant so the answer stays comparable.
    if (sys.env.get("SPARK_GRAFT_PROBE_MODE").contains("evalsweep")) {
      def evalMixN(d: DataFrame, k: Int): DataFrame =
        (0 until k).map { r =>
          d.filter(col("doc_id") % 97 === 0)
            .select((col("doc_id") + lit((r + 1).toLong * 50000000L)).as("doc_id"),
              regexp_replace(col("text"), "(\\S+)", s"e${r}_$$1").as("text"))
        }.reduce(_ unionByName _)
          .unionByName(d.filter(col("doc_id") % 997 === 0).select("doc_id", "text"))
      val corpus = replicated(2).repartition(cpus.toInt).persist()
      corpus.count()
      factors.foreach { k =>
        val ev = evalMixN(corpus, k).repartition(cpus.toInt).persist()
        val evDocs = ev.count()
        def timed(f: => Long): (Double, Long) = {
          val t0 = System.nanoTime()
          val rows = f
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        val (tE, rE) = timed(Dedup.contaminationPairs(
          corpus, ev, "doc_id", "text", 3).count())
        spark.catalog.clearCache()
        corpus.persist().count(); ev.persist().count()
        val (tB, rB) = timed(Dedup.bloomContaminationPairs(
          corpus, ev, "doc_id", "text", 3).count())
        require(rE == rB, s"decontam twins diverged: $rE vs $rB")
        spark.catalog.clearCache()
        corpus.persist().count()
        ev.unpersist()
        println(f"""{"evalFactor":$k,"evalDocs":$evDocs,"pairs":$rE,"exact_sec":$tE%.2f,"bloom_sec":$tB%.2f}""")
      }
      spark.stop()
      return
    }

    // SPARK_GRAFT_PROBE_MODE=pq: the ANN/PQ family over the embeddings
    // table replicated N× (ids offset into disjoint ranges, every
    // replica's vectors shifted by a small per-replica epsilon so
    // replicas are distinct points — the dedup regime's text salt,
    // for vectors). Times the three gate shapes end to end:
    // train+encode+ADC+re-rank (ann8), store write+append+search from
    // disk (ann9), IVF-PQ residual search (ann10). Codebook/coarse
    // fits are sampleCap-bounded (and, round 12, hash-drawn), so the
    // fit cost must stay FLAT while encode/scan track corpus size.
    if (sys.env.get("SPARK_GRAFT_PROBE_MODE").contains("pq")) {
      import graft.operators.Similarity
      val eBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
      def replicatedE(n: Int): DataFrame =
        if (n == 1) eBase
        else (0 until n).map { r =>
          eBase.select((col("vec_id") + lit(r.toLong * 10000000L)).as("vec_id"),
            transform(col("embedding"),
              x => x + lit(r * 1e-3f)).as("embedding"),
            col("label"))
        }.reduce(_ unionByName _)
      factors.foreach { n =>
        val corpus = replicatedE(n).repartition(cpus.toInt).persist()
        val vecs = corpus.count()
        val q = eBase.filter(col("vec_id") < 5)
        def timed(name: String)(f: => Long): String = {
          val t0 = System.nanoTime()
          val rows = f
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          corpus.persist().count()
          f""""$name":[$dt%.2f,$rows]"""
        }
        val tmp = java.nio.file.Files
          .createTempDirectory(s"pqprobe$n").toString
        val rows = Seq(
          timed("ann8_encode_adc") {
            val cb = Similarity.trainPq(corpus, dim = 64, m = 8, k = 16,
              sampleCap = 20000)
            Similarity.pqTopKReranked(Similarity.pqEncode(corpus, cb),
              cb, q, corpus, 5, depth = 50).count()
          },
          timed("ann9_store_write_append_search") {
            Similarity.writePqIndex(
              corpus.filter(col("vec_id") % 5 =!= 0), s"$tmp/pq",
              dim = 64, m = 8, k = 16, sampleCap = 20000)
            Similarity.appendToPqIndex(
              corpus.filter(col("vec_id") % 5 === 0), s"$tmp/pq", 1L)
            Similarity.pqTopKFromIndex(s"$tmp/pq", q, corpus, 5,
              depth = 50).count()
          },
          timed("ann10_ivf_pq") {
            Similarity.ivfPqTopK(corpus, q, 5).count()
          },
          // exact hard-negative miner with a FIXED anchor set: cost =
          // anchors × corpus scan, so the row must track corpus size
          // exactly (the ANN-fed twin dodges even that)
          timed("ann12_hard_negatives") {
            Similarity.hardNegatives(corpus,
              eBase.filter(col("vec_id") < 10), 5).count()
          })
        corpus.unpersist()
        println(s"""{"n":$n,"vecs":$vecs,"queries":${rows.mkString("{", ",", "}")}}""")
      }
      spark.stop()
      return
    }

    // SPARK_GRAFT_PROBE_MODE=knn: the k-NN-join cost law. nCells grows
    // WITH the corpus (per-cell size held roughly constant) and the
    // quantizer fit is sample-capped, so candidate volume —
    // |corpus|·nProbe·cellSize — must track corpus size LINEARLY: a
    // flat per-vector cost is the 100 TB contract for the
    // neighbor-graph builder. medoidAssign rides along (fixed seed
    // set ⇒ the same linear law, no fit at all).
    if (sys.env.get("SPARK_GRAFT_PROBE_MODE").contains("knn")) {
      import graft.operators.Similarity
      val eBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
      def replicatedE(n: Int): DataFrame =
        if (n == 1) eBase
        else (0 until n).map { r =>
          eBase.select((col("vec_id") + lit(r.toLong * 10000000L)).as("vec_id"),
            transform(col("embedding"),
              x => x + lit(r * 1e-3f)).as("embedding"),
            col("label"))
        }.reduce(_ unionByName _)
      factors.foreach { n =>
        val corpus = replicatedE(n).repartition(cpus.toInt).persist()
        val vecs = corpus.count()
        def timed(name: String)(f: => Long): String = {
          val t0 = System.nanoTime()
          val rows = f
          val dt = (System.nanoTime() - t0) / 1e9
          f""""$name":[$dt%.2f,$rows]"""
        }
        val rows = Seq(
          timed("ann17_knn_join") {
            Similarity.knnJoin(corpus, k = 3, nCells = 8 * n, nProbe = 2,
              fitCap = 20000).count()
          },
          timed("ann18_medoid_assign") {
            Similarity.medoidAssign(corpus,
              eBase.filter(col("vec_id") < 8)
                .select(col("vec_id").as("seed_id"), col("embedding"))).count()
          })
        corpus.unpersist()
        println(s"""{"n":$n,"vecs":$vecs,"queries":${rows.mkString("{", ",", "}")}}""")
      }
      spark.stop()
      return
    }

    // SPARK_GRAFT_PROBE_MODE=maint: incremental index maintenance vs
    // full rebuild as the corpus grows N× with the MOVED SLIVER held at
    // a fixed absolute size (edits/deletes keyed off the base-replica id
    // range only, a constant set of new adds). The 100 TB claim under
    // test: a weekly catchup pays one skinny (id, fp) diff scan —
    // cheap-linear — plus embedding ONLY the sliver, while a rebuild
    // re-embeds (and re-clusters) everything. The incremental row must
    // stay near-flat where the rebuild row tracks corpus size.
    if (sys.env.get("SPARK_GRAFT_PROBE_MODE").contains("maint")) {
      import graft.operators.Similarity
      // deliberately NON-trivial embed (64 dims, each a fresh hash of
      // the full text): a stand-in for real encoder cost, so the
      // rebuild row carries a visible per-doc embedding price for the
      // incremental row to dodge
      def embed(df: DataFrame): DataFrame = df.select(col("doc_id"),
        transform(sequence(lit(0), lit(63)), i =>
          pmod(xxhash64(col("text"), i), lit(997)).cast("float"))
          .as("embedding"))
      factors.foreach { n =>
        val oldSnap = replicated(n).select("doc_id", "text")
          .repartition(cpus.toInt).persist()
        val docs = oldSnap.count()
        // fixed absolute sliver: base-replica ids only (replicas carry
        // +r*1e7 offsets, so these predicates never grow with n)
        val isBase = col("doc_id") < 10000000L
        val newSnap = oldSnap
          .filter(!(isBase && col("doc_id") % 1999 === 7)) // ~30 deletes
          .select(col("doc_id"),
            when(isBase && col("doc_id") % 1999 === 0,
              concat(col("text"), lit(" rev2"))) // ~30 edits
              .otherwise(col("text")).as("text"))
          .unionByName(spark.range(50).select( // 50 adds
            (col("id") + 800000000L).as("doc_id"),
            concat(lit("freshly added maintained document "), col("id"))
              .as("text")))
          .repartition(cpus.toInt).persist()
        newSnap.count()
        val tmp = java.nio.file.Files
          .createTempDirectory(s"maintprobe$n").toString
        // base install (untimed — the steady state being maintained)
        Similarity.writeIvfIndex(embed(oldSnap), s"$tmp/idx",
          nCells = 16, idCol = "doc_id")
        def timed(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        val tIncr = timed {
          Similarity.incrementalReembedIvf(oldSnap, newSnap, embed,
            s"$tmp/idx", batchId = 1L, idCol = "doc_id",
            textCol = "text")
        }
        val tRebuild = timed {
          Similarity.writeIvfIndex(embed(newSnap), s"$tmp/idx_full",
            nCells = 16, idCol = "doc_id")
        }
        val live = Similarity.liveIndexRows(spark, s"$tmp/idx").count()
        val expect = newSnap.count()
        require(live == expect, s"maintained index live=$live want=$expect")
        oldSnap.unpersist(); newSnap.unpersist()
        println(f"""{"n":$n,"docs":$docs,"incremental_sec":$tIncr%.2f,"rebuild_sec":$tRebuild%.2f,"live":$live}""")
      }
      spark.stop()
      return
    }

    // SPARK_GRAFT_PROBE_MODE=compaction: the FOLD's own cost law
    // (round-18 verdict #7). A long ingest line accumulates batch=<id>
    // generation dirs; the claim under test is two-sided: (1) fold
    // cost is O(store) — it scales with total rows folded, not
    // superlinearly with generation count; (2) the POST-fold probe is
    // FLAT in how many generations the store had before folding — the
    // fold actually resets listing/merge cost to the single-generation
    // floor, on both foldable probe families (fp exact-dedup,
    // near-dup). Args are generation counts (default 1 4 16); each run
    // installs the store, appends G−1 distinct salted batches, times
    // probe-before-fold / fold / probe-after-fold, and REQUIRES the
    // post-fold probes flat across G (2× slack for box noise on
    // few-second walls).
    if (sys.env.get("SPARK_GRAFT_PROBE_MODE").contains("compaction")) {
      val genCounts = if (args.nonEmpty) args.toSeq.map(_.toInt)
        else Seq(1, 4, 16)
      val corpus = replicated(2).persist()
      val docs = corpus.count()
      def salted(off: Long, tag: String): DataFrame =
        base.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + off).as("doc_id"),
            concat(col("text"), lit(s" $tag")).as("text"))
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val postFp = scala.collection.mutable.Map.empty[Int, Double]
      val postNd = scala.collection.mutable.Map.empty[Int, Double]
      genCounts.foreach { g =>
        val tmp = java.nio.file.Files
          .createTempDirectory(s"compactprobe$g").toString
        val probe = salted(900000000L, "probe")
        // fp store: install + g−1 appends of distinct fps
        Dedup.writeFpStore(corpus, "doc_id", "text", s"$tmp/fp",
          expectedTotalFps = 1000000L)
        (1 until g).foreach { i =>
          Dedup.appendToFpStore(
            salted(i.toLong * 2000000L, s"gen$i")
              .select(TextAnalysis.fingerprint(col("text")).as("fp"))
              .distinct().localCheckpoint(),
            s"$tmp/fp", batchId = i.toLong)
        }
        def fpProbe(): Unit = {
          Dedup.incrementalExactDedupFromFpStore(probe, s"$tmp/fp",
            "doc_id", "text").count()
          spark.catalog.clearCache()
        }
        val fpPre = timed(fpProbe())
        val fpFold = timed(Dedup.compactFpStore(spark, s"$tmp/fp"))
        val fpPost = timed(fpProbe())
        postFp(g) = fpPost
        // near-dup store: same shape on the banded family
        Dedup.writeNearDupStore(corpus, "doc_id", "text", s"$tmp/nd")
        (1 until g).foreach { i =>
          Dedup.appendToNearDupStore(salted(i.toLong * 2000000L, s"gen$i"),
            s"$tmp/nd", "doc_id", "text", batchId = i.toLong)
        }
        def ndProbe(): Unit = {
          Dedup.incrementalNearDupFromStore(probe, s"$tmp/nd",
            "doc_id", "text").count()
          spark.catalog.clearCache()
        }
        val ndPre = timed(ndProbe())
        val ndFold = timed(Dedup.compactNearDupStore(spark, s"$tmp/nd"))
        val ndPost = timed(ndProbe())
        postNd(g) = ndPost
        println(f"""{"mode":"compaction","gens":$g,"docs":$docs,""" +
          f""""fp":{"pre_probe":$fpPre%.2f,"fold":$fpFold%.2f,"post_probe":$fpPost%.2f},""" +
          f""""neardup":{"pre_probe":$ndPre%.2f,"fold":$ndFold%.2f,"post_probe":$ndPost%.2f}}""")
      }
      // the flatness claim, ASSERTED: post-fold probe cost must not
      // track pre-fold generation count (2× slack on few-second walls)
      Seq("fp" -> postFp, "neardup" -> postNd).foreach { case (fam, m) =>
        val (lo, hi) = (m.values.min, m.values.max)
        require(hi <= 2.0 * lo + 0.5,
          f"$fam post-fold probe not flat across generations: " +
            f"min $lo%.2f s, max $hi%.2f s")
      }
      corpus.unpersist()
      spark.stop()
      return
    }

    // SPARK_GRAFT_PROBE_MODE=bandab: the controlled A/B isolating the
    // v2 band-key premium (the round-15 adverse bench signal: d25
    // 8.1→14.4 s, d14 3.3→7.0 s vs the r14 binary, never separated
    // from box noise). ONE binary, two layouts per rep, interleaved on
    // the same corpus: pfxBits=2 (v2 — installs/appends ALSO land the
    // (band, pfx)-partitioned band-key generation; probes prune) vs
    // pfxBits=0 (v1 — no band-key table; probes band the full
    // signature scan). Medians over `reps` reps; each (rep, layout)
    // gets its own salted batch so the operators' plan-keyed caches
    // never cross-serve, and the cache is cleared between layouts.
    // The headline is (v2 − v1) per op: the install/append premium the
    // pruned probe buys, measured with everything else bit-identical.
    if (sys.env.get("SPARK_GRAFT_PROBE_MODE").contains("bandab")) {
      val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "5").toInt
      val corpus = replicated(2)
      val docs = corpus.count()
      def salted(off: Long, tag: String): DataFrame =
        base.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + off).as("doc_id"),
            when(col("doc_id") % 97 === 0, col("text"))
              .otherwise(concat(col("text"), lit(s" $tag"))).as("text"))
      val batchDocs = salted(700000000L, "x").count()
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val out = scala.collection.mutable.Map[(String, String), Vector[Double]]()
        .withDefaultValue(Vector())
      (1 to reps).foreach { rep =>
        Seq(("v2", 2), ("v1", 0)).foreach { case (layout, pfx) =>
          val tmp = java.nio.file.Files
            .createTempDirectory(s"bandab_${layout}_$rep").toString
          val append = salted(700000000L + rep * 2000000L,
            s"fresh-$layout-$rep")
          val probe = salted(800000000L + rep * 2000000L,
            s"probe-$layout-$rep")
          out((layout, "install")) :+= timed {
            Dedup.writeNearDupStore(corpus, "doc_id", "text", s"$tmp/nd",
              pfxBits = pfx)
          }
          out((layout, "append")) :+= timed {
            Dedup.appendToNearDupStore(append, s"$tmp/nd", "doc_id",
              "text", batchId = 1L)
          }
          out((layout, "probe")) :+= timed {
            Dedup.incrementalNearDupFromStore(probe, s"$tmp/nd",
              "doc_id", "text").count()
          }
          // drop the operators' plan-keyed internal persists so the
          // next layout/rep starts cold (NOTES.md cache policy)
          spark.catalog.clearCache()
        }
      }
      def med(xs: Vector[Double]): Double = {
        val s = xs.sorted; s(s.size / 2)
      }
      def sect(layout: String): String =
        Seq("install", "append", "probe").map { op =>
          val xs = out((layout, op))
          f""""$op":${med(xs)}%.2f,"${op}_all":[${
            xs.map(x => f"$x%.2f").mkString(",")}]"""
        }.mkString("{", ",", "}")
      println(s"""{"mode":"bandab","docs":$docs,"batch":$batchDocs,""" +
        s""""reps":$reps,"v2":${sect("v2")},"v1":${sect("v1")}}""")
      spark.stop()
      return
    }

    // SPARK_GRAFT_PROBE_MODE=medallion: the reference's FLAGSHIP
    // pipeline (silver cleaners → gold featurizers → feature/label
    // stores) at growing LOAN-SPINE counts — the scale law for the one
    // composite the reference actually ships. The loan table is the
    // fact side (n×10k rows); the dim tables keep the generator's
    // one-row-per-(member, week) grid (the reference's dims are
    // per-member snapshots — growing them would duplicate join keys
    // and measure a key-explosion artifact, not the pipeline). The
    // chain is mode/mean statistics (one aggregation each), map-side
    // cleaning, the top-10 fit, and three left joins — the curve must
    // be linear with flat per-row cost: a bend means a statistics job
    // or join stopped scaling before 100 TB would.
    if (sys.env.get("SPARK_GRAFT_PROBE_MODE").contains("medallion")) {
      factors.foreach { n =>
        val nLoans = 10000 * n
        val t0 = System.nanoTime()
        val frame = graft.queries.PipelineE2E.parityFrame(spark, nLoans)
        val (rows, cols) = (frame.count(), frame.columns.length.toLong)
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"""{"n":$n,"loans":$nLoans,"store_rows":$rows,"cols":$cols,"medallion_sec":$dt%.2f}""")
      }
      spark.stop()
      return
    }

    // SPARK_GRAFT_PROBE_MODE=ingest: the ingest loops' per-batch cost
    // claim — O(batch), NOT O(landed corpus) — measured directly. Hold
    // the BATCH fixed (a ~10% slice, ids offset + text salted so it's
    // mostly novel with a small verbatim-dup sliver) and grow the
    // LANDED STORE n×; time the store-backed batch entry points each
    // loop calls. Exact dedup must stay flat (negative Bloom probes
    // never touch the store table); near-dup must stay flat-to-gently-
    // linear (band buckets, candidate-bounded); LM scoring must stay
    // flat (capped broadcast model); IVF append must stay flat
    // (centroids only). A curve bending with the store is a loop that
    // would die on week 50 of a crawl.
    if (sys.env.get("SPARK_GRAFT_PROBE_MODE").contains("ingest")) {
      import graft.operators.{Dedup, Multimodal, Ppm, Similarity, TextAnalysis}
      def embed(df: DataFrame): DataFrame = df.select(col("doc_id"),
        transform(sequence(lit(0), lit(7)), i =>
          pmod(length(col("text")) * 31 + col("doc_id") * 17 + i * 7,
            lit(97)).cast("float")).as("embedding"))
      // the mm4 image synthesis (md5-avalanched 16×8 PPMs) — store
      // installs and batch probes both pay it, so the timed row prices
      // decode+hash+banded join, dominated by the store-side hash scan
      def ppmify(df: DataFrame): DataFrame = {
        import spark.implicits._
        df.select(col("doc_id"),
          concat((2 to 5).map(i =>
            md5(concat(col("text"), lit(s":$i")))): _*).as("hex"))
          .as[(Long, String)]
          .map { case (id, hex) =>
            val px = hex.getBytes("US-ASCII")
            (id, Ppm.encode(16, 8, px.flatMap(b => Array(b, b, b))))
          }.toDF("media_id", "bytes")
      }
      // batch ids must stay disjoint from EVERY replica's id range
      // (replica r offsets by r·10M): derive the offset from the max
      // factor instead of pinning 700M, which a factor ≥ 70 would have
      // silently collided with — corrupting the dedup operators'
      // disjoint-id contract mid-probe
      val batchIdOffset =
        math.max(700000000L, (factors.max + 1).toLong * 10000000L)
      val batch = base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + batchIdOffset).as("doc_id"),
          when(col("doc_id") % 97 === 0, col("text"))
            .otherwise(concat(col("text"), lit(" fresh-batch")))
            .as("text"),
          col("source"))
        .repartition(cpus.toInt).persist()
      val batchDocs = batch.count()
      factors.foreach { n =>
        val corpus = replicated(n).repartition(cpus.toInt).persist()
        val docs = corpus.count()
        val tmp = java.nio.file.Files
          .createTempDirectory(s"ingestprobe$n").toString
        // store installs: untimed — the landed steady state
        Dedup.writeFpStore(corpus, "doc_id", "text", s"$tmp/fp",
          expectedTotalFps = math.max(docs * 2, 100000L))
        Dedup.writeNearDupStore(corpus, "doc_id", "text", s"$tmp/nd")
        TextAnalysis.writeBigramLmStore(
          corpus.filter(col("source") === "src0"), "text", s"$tmp/lm")
        Similarity.writeIvfIndex(embed(corpus), s"$tmp/ivf",
          nCells = 16, idCol = "doc_id")
        Multimodal.writeImageNearDupStore(ppmify(corpus), s"$tmp/imgnd")
        TextAnalysis.writeBm25Index(corpus, s"$tmp/bm25", buckets = 64)
        def timed(name: String)(f: => Long): String = {
          val t0 = System.nanoTime()
          val rows = f
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          corpus.persist().count(); batch.persist().count()
          f""""$name":[$dt%.2f,$rows]"""
        }
        val rowsOut = Seq(
          timed("exact_from_store")(
            Dedup.incrementalExactDedupFromFpStore(batch, s"$tmp/fp",
              "doc_id", "text").count()),
          timed("neardup_from_store")(
            Dedup.incrementalNearDupFromStore(batch, s"$tmp/nd",
              "doc_id", "text", threshold = 0.8).count()),
          timed("lm_score_batch")(
            TextAnalysis.bigramLogProbFromStore(batch, s"$tmp/lm",
              "doc_id", "text").count()),
          timed("ivf_append") {
            Similarity.appendToIvfIndex(embed(batch), s"$tmp/ivf",
              batchId = 99L, idCol = "doc_id")
            batchDocs
          },
          // round 15: the store is banded + (band, pfx)-partitioned at
          // rest, so the probe reads only the partitions the batch's
          // own prefixes can collide in — the formerly store-linear
          // hash scan now prunes (flat when batch prefixes don't cover
          // the prefix space; worst-case the old skinny scan)
          timed("image_neardup_from_store")(
            Multimodal.incrementalImageNearDup(ppmify(batch),
              s"$tmp/imgnd", maxHamming = 3).count()),
          // BM25 store probe against the GROWING index: the postings
          // scan is partition-pruned to the query terms' buckets, but
          // the synthetic ~31-word vocabulary makes every posting list
          // corpus-length, so the row prices the WORST case — pruning
          // cuts the file set, posting volume still grows linearly.
          // Real vocabularies spread thin (a query's terms hit a few
          // bounded lists) — there the row is flat; here it must stay
          // ≤ linear in the landed corpus
          timed("bm25_probe_from_store")(
            TextAnalysis.bm25TopKFromIndex(s"$tmp/bm25",
              base.filter(col("doc_id") % 83 === 0 && col("doc_id") < 500)
                .select(col("doc_id").as("q_id"),
                  substring(col("text"), 1, 60).as("q_text")),
              k = 5, maxDfRatio = 1.0).count()))
        corpus.unpersist()
        println(s"""{"n":$n,"landedDocs":$docs,"batchDocs":$batchDocs,"queries":${rowsOut.mkString("{", ",", "}")}}""")
      }
      spark.stop()
      return
    }

    factors.foreach { n =>
      val corpus = replicated(n)
        .repartition(cpus.toInt).persist()
      val docs = corpus.count() // materialize input outside the timings
      val timed = ops.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val rows = fn(corpus).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // drop operator-internal caches (shared shingle projections)
        // so each op's number is attributable to that op alone —
        // re-persist the input, which clearCache also evicted
        spark.catalog.clearCache()
        corpus.persist().count()
        f""""$name":[$dt%.2f,$rows]"""
      }
      corpus.unpersist()
      println(s"""{"n":$n,"docs":$docs,"queries":${timed.mkString("{", ",", "}")}}""")
    }
    require(baseN > 0)
    spark.stop()
  }
}
