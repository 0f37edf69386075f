package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sampling / splitting operators (SURVEY §2.9 R1–R2).
  *
  * The engine's preferred split is HASH-based, not RNG-based: membership
  * is a pure function of the row key, so it is reproducible across runs,
  * partitionings, and cluster sizes — the property sklearn's
  * random_state split only gives you on one machine with one ordering.
  * Seeded `sample`/`sampleBy` are kept for reference parity.
  */
object Sampling {

  /** R1 — Bernoulli sample (model_operations.py:79–85). */
  def bernoulli(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(fraction, seed)

  /** R2 — stratified sample: per-class fractions (sampleBy). */
  def stratified(df: DataFrame, labelCol: String,
                 fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(labelCol, fractions, seed)

  /** Deterministic hash membership: true ⇔ row lands in [0, pct) of 100
    * buckets derived from xxhash64(key, salt). The fast IN-ENGINE
    * bucketing primitive (one codegen'd 8-byte hash, no digest) — use it
    * where the consumer is this engine; for a membership rule other SQL
    * engines can recompute, use `portableTestMember`. */
  def hashBucket(key: Column, salt: String): Column =
    pmod(xxhash64(key, lit(salt)), lit(100))

  /** The hex expansion of pct/100 to 32 digits — the md5-space threshold
    * below which a key is a test member. Exact integer arithmetic
    * (pct/100 in base 16 digit by digit), so both engines compare against
    * the identical string. */
  private[ops] def pctHexThreshold(pct: Int): String = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    if (pct == 100) "g" // lexicographically above every hex digest
    else {
      val sb = new StringBuilder
      var x = pct
      (1 to 32).foreach { _ =>
        x *= 16
        sb.append(Character.forDigit(x / 100, 16))
        x %= 100
      }
      sb.toString
    }
  }

  /** Cross-ENGINE-portable test membership: md5 hex of (key || salt)
    * compared lexicographically against the 32-hex-digit expansion of
    * pct/100. md5 produces the identical lowercase hex string in Spark,
    * DuckDB, Postgres, …, and hex strings of equal length order like the
    * 128-bit integers they encode, so membership — not just the split
    * fractions — is reproducible by ANY engine:
    * `md5(CAST(key AS VARCHAR) || salt) < '<threshold>'`. */
  def portableTestMember(key: Column, pct: Int, salt: String): Column =
    md5(concat(key.cast("string"), lit(salt)).cast("binary")) <
      lit(pctHexThreshold(pct))

  /** R2 (engine-native) — reproducible stratified-ish train/test split:
    * same key always lands on the same side, no RNG, no collect, and the
    * membership rule is recomputable by any SQL engine (md5-threshold —
    * the driver's DuckDB oracle recomputes the exact member set).
    * Returns (train, test). */
  def hashSplit(df: DataFrame, keyCol: String, testPct: Int,
                salt: String = "split"): (DataFrame, DataFrame) = {
    val t = portableTestMember(col(keyCol), testPct, salt)
    (df.filter(!t), df.filter(t))
  }

  /** LEAKAGE-FREE train/test split: the hash-split rule keyed on the
    * document's canonical content FINGERPRINT instead of its id, so
    * every exact-duplicate group lands WHOLE on one side — an id-keyed
    * split scatters copies of the same text across train and test,
    * and the model is then evaluated on its own training data (the
    * contamination Lee et al. 2021, arXiv:2107.06499 measure;
    * fuzzy-dup leakage is the decontamination family's job — this op
    * closes the exact-dup channel at split time). Same
    * [[portableTestMember]] md5-threshold rule as [[hashSplit]], so
    * the member set is recomputable by any SQL engine. Pure map-side:
    * the fingerprint and the hash are per-row expressions; no
    * shuffle, no state. Output: the input plus a `split` column. */
  def leakageFreeSplit(df: DataFrame, textCol: String, testPct: Int,
                       salt: String = "split"): DataFrame =
    df.withColumn("split",
      when(portableTestMember(
        graft.operators.TextAnalysis.fingerprint(col(textCol)),
        testPct, salt), "test").otherwise("train"))

  /** UniMax language-budget allocation + selection census (Chung et
    * al. 2023, arXiv:2304.09151 — the standard multilingual
    * pretraining sampler: give every language an EQUAL share of the
    * token budget except where a language's corpus would repeat past
    * `maxEpochs`, and redistribute what the capped languages cannot
    * absorb). The allocation is the paper's water-filling recurrence
    * over languages in ascending-capacity order:
    *   alloc_i = min(cap_i, remaining ÷ languagesLeft)   (integer ÷)
    * run DRIVER-SIDE over the ≤#languages (lang, total-tokens) rows —
    * a bounded collect by construction (the modes convention). Doc
    * selection inside a language is `alloc` tokens' worth: full
    * epochs (alloc ÷ total) of every doc plus the md5-rank-ordered
    * greedy prefix of the remainder (the quotaSample draw convention
    * — deterministic, engine-portable, no RNG). ALL arithmetic is
    * integer, so any SQL engine recomputes the allocation and the
    * census bit-for-bit (a float water-level would drift at the
    * boundary).
    *
    * Scale shape: token counting is map-side; the per-lang totals are
    * a groups-sized aggregate; the prefix scan is a window over
    * SKINNY (id, lang, ntok) rows — per-language partitions are the
    * natural shard unit and text never enters. Output: one census row
    * per language — (lang, cap_toks, alloc_toks, n_docs_sel,
    * tok_sel). */
  def unimaxCensus(df: DataFrame, idCol: String, langCol: String,
                   textCol: String, budgetTokens: Long,
                   maxEpochs: Int): DataFrame = {
    require(budgetTokens >= 0 && maxEpochs >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    // one skinny materialization feeds the totals AND the prefix scan;
    // ntok coalesced to 0 — a NULL-text doc counts as zero tokens, and
    // the distributed prefix sum requires non-null values (its contract)
    val t = df.select(col(idCol).as("id"), col(langCol).as("lang"),
      coalesce(graft.operators.TextAnalysis.tokenCount(col(textCol))
        .cast("long"), lit(0L)).as("ntok"))
      .localCheckpoint()
    val perLang = t.groupBy("lang")
      .agg(sum("ntok").as("tot"), count(lit(1)).as("nd"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // ascending-capacity water filling, ties broken on lang for a
    // total order both engines share
    val caps = perLang.map { case (l, tot, nd) =>
      (l, tot * maxEpochs, tot, nd)
    }.sortBy { case (l, cap, _, _) =>
      // null langs sort AFTER every real code at equal cap (the flag),
      // never NPE the driver on dirty data (a null String key throws
      // inside the implicit String ordering)
      (cap, l == null, Option(l).getOrElse(""))
    }
    var remaining = budgetTokens
    var left = caps.length
    val quotas = caps.map { case (l, cap, tot, nd) =>
      val alloc = math.min(cap, remaining / left)
      remaining -= alloc
      left -= 1
      // tot = 0 (a language of only empty/null texts) ⇒ cap = 0 ⇒
      // alloc = 0: zero epochs, zero remainder — not a driver crash
      // on integer division by zero
      val (ep, rem) = if (tot == 0) (0L, 0L) else (alloc / tot, alloc % tot)
      (l, cap, alloc, ep, rem, tot, nd)
    }.toSeq
    val qdf = quotas.toDF("lang", "cap", "alloc", "ep", "rem", "tot", "nd")
    // distributed prefix sum — NOT a Window.partitionBy(lang) cumsum:
    // the dominant language would ride one task's sort at crawl scale
    // (the ccnetBuckets rationale; shared primitive)
    val ordered = t.withColumn("_ord",
      md5(concat(col("id").cast("string"), lit("unimax"))))
    // null-safe lang joins: a dirty null-language slice still gets a
    // census row instead of silently vanishing from the prefix scan
    val part = graft.ops.DistributedRank.withRankAndCumsum(ordered,
        "lang", Seq(col("_ord"), col("id")), Some("ntok"))
      .join(broadcast(qdf.select(col("lang").as("_ql"), col("rem"))),
        col("lang") <=> col("_ql"))
      .filter(col("_cum") <= col("rem"))
      .groupBy("lang")
      .agg(count(lit(1)).as("pn"), sum("ntok").as("ptok"))
      .withColumnRenamed("lang", "_pl")
    qdf.join(part, col("lang") <=> col("_pl"), "left")
      .select(col("lang"), col("cap").as("cap_toks"),
        col("alloc").as("alloc_toks"),
        (col("ep") * col("nd") + coalesce(col("pn"), lit(0L)))
          .as("n_docs_sel"),
        (col("ep") * col("tot") + coalesce(col("ptok"), lit(0L)))
          .as("tok_sel"))
  }

  /** [[leakageFreeSplit]] for NEAR-duplicates — the complete leakage
    * channel: an exact-fingerprint split still lets a train doc that
    * is a fuzzy near-dup of a test doc leak (Lee et al. 2021 measure
    * exactly this residual). Near-dup CLUSTERS (connected components
    * over the candidate pair graph — the d6 machinery) are the split
    * unit: the md5-threshold rule keys on the cluster label, so every
    * mutually-similar group lands whole on one side; singletons key
    * on their own id, which IS their component label, keeping the
    * rule uniform. Scale: components are (node, label)-only shuffles;
    * the label join is id-keyed skinny rows; the membership test is
    * per-row. Output: the input plus `cluster_id` and `split`. */
  def leakageFreeSplitNearDup(df: DataFrame, pairs: DataFrame,
                              idCol: String, testPct: Int,
                              salt: String = "split"): DataFrame = {
    val comp = graft.operators.Dedup
      .connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("id", idCol)
    df.join(comp, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("split",
        when(portableTestMember(col("cluster_id"), testPct, salt), "test")
          .otherwise("train"))
  }

  /** Per-group quota sample: keep `quota` rows per group, selected by a
    * deterministic pseudo-random rank — md5 of the key's string form, so
    * the selection is reproducible across runs, partitionings, AND
    * engines (md5 is cross-engine comparable where xxhash64 is not; the
    * key tiebreak covers md5 collisions). The standard corpus-balancing
    * step: cap each language/source/domain at a fixed share.
    *
    * The per-group rank rides [[graft.ops.DistributedRank]]: the group
    * is typically a language/source and a real crawl is ~45% one
    * language, so a plain `Window.partitionBy(group)` would sort the
    * dominant group in ONE task at crawl scale. The rank runs over the
    * SKINNY (group, key) projection only — the payload (raw text,
    * embeddings) never rides the range exchange or the checkpoint —
    * and the kept keys (≤ quota · |groups| rows, usually broadcastable)
    * semi-join the input back. CONTRACT: `keyCol` is unique within
    * each group (every call site keys on a document id) — a violation
    * SILENTLY OVER-FILLS the quota (the semi join keeps every copy of
    * a kept key, where the pre-round-14 window implementation kept
    * exactly `quota` arbitrary rows); run [[requireUniqueKeys]] in
    * debug/CI to make violations fail loudly instead. */
  /** Debug/CI gate for the draw family's keyCol-uniqueness contract
    * (quotaSample / temperatureMix / shuffleShard): one aggregation
    * over the skinny (group, key) projection, failing loudly with the
    * first offending key — the alternative is a semi join that
    * silently keeps every duplicate copy of a kept key (over-quota).
    * Deliberately a separate opt-in call, not a flag: the check is a
    * full extra shuffle, which a production draw over a contract-
    * honest corpus must not pay per run. */
  def requireUniqueKeys(df: DataFrame, groupCol: String,
                        keyCol: String): Unit = {
    val dup = df.groupBy(col(groupCol), col(keyCol))
      .agg(count(lit(1)).as("_n")).filter(col("_n") > 1)
      .limit(1).collect()
    require(dup.isEmpty,
      s"draw contract violated: key ${dup.headOption.map(_.get(1))} " +
        s"appears ${dup.headOption.map(_.getLong(2))}x in group " +
        s"${dup.headOption.map(_.get(0))} — deduplicate or re-key " +
        "before quota/temperature draws (duplicates silently over-fill " +
        "the quota)")
  }

  def quotaSample(df: DataFrame, groupCol: String, keyCol: String,
                  quota: Int): DataFrame = {
    val kept = graft.ops.DistributedRank.withRankAndCumsum(
        df.select(col(groupCol), col(keyCol)), groupCol,
        Seq(md5(col(keyCol).cast("string").cast("binary")), col(keyCol)))
      .filter(col("_rk") <= quota)
      .select(col(groupCol).as("_qg"), col(keyCol).as("_qk"))
    df.join(kept,
      df(groupCol) <=> col("_qg") && df(keyCol) <=> col("_qk"),
      "left_semi")
  }

  /** R6 — epoch-based source mixing (data-constrained pretraining:
    * scarce high-quality sources are repeated for several epochs while
    * abundant web text makes one pass — the repetition rule studied in
    * Muennighoff et al. 2023, "Scaling Data-Constrained Language
    * Models"). Each row is replicated `epochs(group)` times (groups not
    * in the map get `defaultEpochs`) and tagged with a 1-based `epoch`
    * index, so a downstream shuffle/pack stage sees each repetition as
    * an independent row.
    *
    * Scale shape: the epoch table is a tiny map LITERAL folded into the
    * projection and the replication is `explode(sequence(...))` — pure
    * map-side generate, ZERO shuffle and zero join at any corpus size.
    * Row growth is exactly Σ epochs(srcᵢ)·nᵢ, the caller's declared
    * budget. */
  def epochMix(df: DataFrame, groupCol: String, epochs: Map[String, Int],
               defaultEpochs: Int = 1): DataFrame = {
    require(defaultEpochs >= 1 && epochs.values.forall(_ >= 1),
      "epoch counts must be >= 1 (0 would silently drop a source)")
    val perGroup =
      if (epochs.isEmpty) lit(defaultEpochs.toLong)
      else coalesce(
        element_at(
          map(epochs.toSeq.flatMap { case (k, v) =>
            Seq(lit(k), lit(v.toLong)) }: _*),
          col(groupCol)),
        lit(defaultEpochs.toLong))
    df.withColumn("epoch", explode(sequence(lit(1L), perGroup)))
  }

  /** R7 — deterministic corpus shuffle-and-shard: the "global shuffle
    * before handing shards to trainer workers" stage, as a pure
    * function of the key (no RNG state, reproducible across runs,
    * partitionings, cluster sizes, and engines).
    *
    * Shard = (index of the first md5 hex digit in "0123456789abcdef")
    * mod nShards — map-side, uniform, and recomputable by ANY SQL
    * engine as plain string arithmetic (instr/strpos — no hex-to-int
    * builtin needed, which DuckDB lacks); position-within-shard = rank
    * by the REMAINING md5 hex (independent of the digit that chose the
    * shard), tie-broken by key. A global row_number would serialize
    * the corpus into one partition, and a per-shard window caps the
    * rank at nShards ≤ 16 tasks REGARDLESS of cluster size — so the
    * position rides [[graft.ops.DistributedRank]] (shard as the group
    * column) over the SKINNY key projection, (shard, pos) joined back
    * by key: every sort is bounded by range-partition size, the rank
    * is bit-identical, the payload never rides the range exchange or
    * the checkpoint, and nShards stays purely the OUTPUT fan-out knob
    * (the trainer-worker/output-file count). CONTRACT: `keyCol` is
    * unique (it IS the shuffle key). nShards must DIVIDE 16: the hex
    * digit is uniform over 16 values, so digit mod a non-divisor
    * (e.g. 12) would load some shards with exactly 2× the documents
    * of others. */
  def shuffleShard(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(Set(1, 2, 4, 8, 16).contains(nShards),
      s"nShards must divide 16 (1/2/4/8/16) for uniform shards, got $nShards")
    // project the digest ONCE — shard digit and order key both read it,
    // and a repeated md5 expression would hash every row twice
    val withHex = df.select(col(keyCol)).withColumn("_hex",
      md5(col(keyCol).cast("string").cast("binary")))
    val shard = pmod(
      (instr(lit("0123456789abcdef"), substring(col("_hex"), 1, 1)) - 1)
        .cast("long"),
      lit(nShards.toLong))
    val ranked = graft.ops.DistributedRank.withRankAndCumsum(
        withHex.withColumn("shard", shard), "shard",
        Seq(substring(col("_hex"), 2, 31), col(keyCol)))
      .select(col(keyCol).as("_sk"), col("shard"),
        col("_rk").as("pos"))
    df.join(ranked, df(keyCol) <=> col("_sk")).drop("_sk")
  }

  /** Temperature-scaled corpus mixing (the multilingual-LLM standard:
    * sample source i with probability ∝ nᵢ^α, α ∈ (0,1] — α = 1 keeps the
    * natural distribution, α → 0 approaches uniform, flattening the
    * head-language dominance; see the mT5/XLM-R mixing rule).
    *
    * Per-group quota = floor(totalTarget · nᵢ^α / Σⱼ nⱼ^α), clamped to
    * [1, nᵢ]; rows inside a group are picked by the same deterministic
    * md5 rank as `quotaSample`, so the draw is reproducible across runs,
    * partitionings, and engines.
    *
    * Scale shape: group sizes are one map-side-combinable count
    * aggregate (|groups| rows to the driver-free quota computation — it
    * stays distributed and broadcasts back); the per-group draw rank
    * rides [[graft.ops.DistributedRank]] over the SKINNY (group, key)
    * projection, kept keys semi-joined back (the quotaSample routing —
    * a plain group-partitioned window would single-task the dominant
    * language at crawl scale; same `keyCol`-unique-within-group
    * contract). */
  def temperatureMix(df: DataFrame, groupCol: String, keyCol: String,
                     alpha: Double, totalTarget: Int): DataFrame = {
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("_n"))
    val wsum = org.apache.spark.sql.expressions.Window.partitionBy()
    val quotas = counts
      .withColumn("_w", pow(col("_n"), alpha) /
        sum(pow(col("_n"), alpha)).over(wsum))
      .withColumn("_quota",
        greatest(lit(1L),
          least(col("_n"), floor(lit(totalTarget.toDouble) * col("_w"))))
          .cast("long"))
      .select(col(groupCol), col("_quota"))
    val kept = graft.ops.DistributedRank.withRankAndCumsum(
        df.select(col(groupCol), col(keyCol)), groupCol,
        Seq(md5(col(keyCol).cast("string").cast("binary")), col(keyCol)))
      .join(broadcast(quotas), Seq(groupCol))
      .filter(col("_rk") <= col("_quota"))
      .select(col(groupCol).as("_qg"), col(keyCol).as("_qk"))
    df.join(kept,
      df(groupCol) <=> col("_qg") && df(keyCol) <=> col("_qk"),
      "left_semi")
  }

  /** Weighted corpus draw WITHOUT an RNG — Efraimidis–Spirakis A-Res
    * (2006) made deterministic: each key gets a reproducible uniform
    * u ∈ (0,1] from its md5 prefix (24 bits — enough that u-ties are
    * rare, and the id tiebreak absorbs them), a selection priority
    * ln(u) · weightScale / w, and the draw keeps the top `n`
    * priorities — the exact weighted-sampling-without-replacement
    * scheme (P[i ∈ sample] follows the ES inclusion law), with the
    * noise source a hash instead of RNG state, so the draw is
    * reproducible across runs, partitionings, AND engines (the md5
    * rank-draw discipline, now weight-aware). This is the C4-era
    * curation shape the verdict asked for: a centrality prior (e.g.
    * [[graft.operators.Graph.linkRank]]'s integer pr) DRIVES the
    * draw — a doc with 10× the rank is ~10× as likely to survive —
    * rather than merely ordering a top-k cut.
    *
    * `weightScale` normalizes integer weights to O(1) (pass the
    * linkRank `scale`), keeping the 6-dp-rounded priority's dynamic
    * range where cross-engine float replay is proven (the r8/dsir
    * rounded-log-weight convention). Priorities round BEFORE the
    * cut on both engines, so the boundary cannot ulp-flip.
    *
    * Scale shape: priorities are map-side arithmetic over the SKINNY
    * (key, weight) projection; the cut is a distributed TakeOrdered
    * (never a corpus-wide window); the ≤ n kept keys broadcast back
    * as a semi join. CONTRACT: `keyCol` unique, weights > 0. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     n: Int, weightScale: Double = 1.0): DataFrame = {
    require(n >= 1, s"n >= 1: $n")
    val u = (conv(substring(md5(col(keyCol).cast("string").cast("binary")),
      1, 6), 16, 10).cast("double") + 1.0d) / lit(16777216.0d)
    val priority = round(
      log(u) * lit(weightScale) / col(weightCol).cast("double"), 6)
    val kept = df.select(col(keyCol), col(weightCol))
      .withColumn("_prio", priority)
      .orderBy(col("_prio").desc, col(keyCol))
      .limit(n)
      .select(col(keyCol).as("_wk"), col("_prio"))
    df.join(broadcast(kept), df(keyCol) <=> col("_wk"))
      .drop("_wk")
  }

  /** Hashed-n-gram bucket of a gram string: the first two md5 hex
    * digits as an int in [0, 256) — `conv` here, plain strpos
    * arithmetic in any engine without a hex-to-int builtin (the
    * `shuffleShard` portability rule). */
  private def gramBucket(g: Column): Column =
    conv(substring(md5(g), 1, 2), 16, 10).cast("int")

  /** R8 — DSIR data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how much more likely its hashed-n-gram features are
    * under the TARGET corpus' bag-of-buckets distribution than under
    * the raw corpus' own, and keep the top `n`. Features are word
    * unigrams + bigrams hashed into 256 buckets; per-doc weight is
    *   log w(x) = Σ_grams [ ln p̂_target(b(g)) − ln p̂_raw(b(g)) ]
    * with add-one smoothing over the bucket vocabulary. The paper
    * resamples with Gumbel noise; the engine convention is RNG-free
    * gates (the m13 precedent), so selection is the deterministic
    * top-n by (rounded log-weight, id) — the same ranking the noisy
    * draw concentrates on.
    *
    * Scale shape: both bucket distributions are ≤ 256-row aggregates
    * collapsed to ONE broadcast row carrying a 256-slot log-ratio
    * array; the raw corpus then scores itself map-side — per doc, one
    * pass over its gram array with element_at lookups, ZERO exchange
    * of text — and the top-n is a distributed TakeOrdered, never a
    * single-partition sort. Output: (id, log_w, rank), rank 1 = most
    * target-like. */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, n: Int, buckets: Int = 256): DataFrame = {
    val rawTok = raw.select(col(idCol).as("id"),
      split(trim(col(textCol)), "\\s+").as("toks"))
    val targetTok = target.select(
      split(trim(col(textCol)), "\\s+").as("toks"))
    dsirSelectTokenized(rawTok, targetTok, n, buckets)
  }

  /** Hashed unigram+bigram buckets from a pre-split token column —
    * grams = unigrams ++ bigrams, then 256-way md5 buckets, all
    * map-side. The token array must already be a PROJECTED column
    * (NOTES gotcha #4: a raw split expression inside the gram lambdas
    * would re-tokenize per element); `keep` columns are aliased in the
    * first select and referenced by NAME after. */
  /** The DSIR/DoReMi feature-gram builder — unigrams ++ bigrams from a
    * pre-split token array. ONE definition feeds both the per-doc
    * bucket-array path (withBuckets) and the explode-then-hash count
    * path (doremiWeightsTokenized): the two operators share a feature
    * space by construction, not by textual convention. */
  private def gramsOf(toks: Column): Column = {
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i + 1, lit(2)))))
      .otherwise(array().cast("array<string>"))
    concat(toks, bigrams)
  }

  private def withBuckets(df: DataFrame, keep: Seq[(Column, String)],
                          toksCol: Column): DataFrame = {
    val tok = df.select(keep.map { case (c, a) => c.as(a) } :+ toksCol.as("_ws"): _*)
    val names = keep.map { case (_, a) => col(a) }
    tok.select(names :+ gramsOf(col("_ws")).as("_grams"): _*)
      .select(names :+ transform(col("_grams"), g => gramBucket(g)).as("_buckets"): _*)
  }

  /** R8 over a PRE-TOKENIZED corpus — the tokenize-once contract for
    * composite pipelines: `rawTok` is (id, toks) and `targetTok` is
    * (toks, …), both carrying an already-split token array (e.g. the
    * shared projection [[graft.operators.TextAnalysis.tokens]] a
    * Gopher stage upstream also consumed), so the composite splits
    * the corpus text exactly once. [[dsirSelect]] is the from-raw-text
    * convenience wrapper; semantics and output are identical. */
  def dsirSelectTokenized(rawTok: DataFrame, targetTok: DataFrame,
                          n: Int, buckets: Int = 256): DataFrame =
    dsirRank(rawTok, rawB => withBuckets(targetTok, Nil, col("toks")),
      n, buckets)

  /** R8 when the TARGET is a SUBSET of the raw pool — the registered
    * r8/llm_select shape (target = a source slice of the same corpus).
    * The raw side's checkpointed (id, buckets) table already holds
    * every target doc's hashed grams, so the target distribution is an
    * id semi-join against it instead of a second tokenize+md5 pass
    * over the slice (optimization guide §1.2: same result, one less
    * full-corpus-slice hash; it also removes the round-18 profiled
    * 3 s single-task stage where the slice's md5 Project was pushed
    * below the widen exchange into the one-row-group scan task).
    * Output is bit-identical to [[dsirSelectTokenized]] on the slice —
    * same docs ⇒ same token arrays ⇒ same buckets ⇒ same counts. */
  def dsirSelectTokenizedWithin(rawTok: DataFrame, targetIds: DataFrame,
                                n: Int, buckets: Int = 256): DataFrame =
    dsirRank(rawTok, rawB => rawB.join(targetIds, "id"), n, buckets)

  private def dsirRank(rawTok: DataFrame,
                       targetB: DataFrame => DataFrame,
                       n: Int, buckets: Int): DataFrame = {
    require(buckets == 256,
      "bucket count is fixed at 256 (two md5 hex digits) for engine portability")
    def dist(bucketed: DataFrame): DataFrame =
      bucketed
        .select(explode(col("_buckets")).as("_b"))
        .groupBy("_b").agg(count(lit(1)).as("_c"))
        .agg(map_from_entries(collect_list(struct(col("_b"), col("_c"))))
          .as("_m"), sum("_c").as("_tot"))
    // the raw side is hashed ONCE: the bucketed frame feeds both its
    // own distribution aggregate and the scoring pass (and, on the
    // subset path, the target distribution too). localCheckpoint,
    // not persist — eager, both consumers read the materialized blocks,
    // and the blocks are released by the ContextCleaner when the frame
    // goes out of scope (a persist here had no unpersist point — the
    // returned DataFrame still depends on the frame — so every call
    // leaked a CacheManager entry for the session lifetime)
    // widen-if-narrow before the gram+md5 map pass (the family's
    // dominant per-row cost; no-op on an already-wide input)
    val rawB = withBuckets(
        graft.core.Tables.widenIfNarrow(rawTok, "id"),
        Seq(col("id") -> "id"), col("toks"))
      .localCheckpoint()
    val ratioRow = dist(targetB(rawB))
      .toDF("_tm", "_ttot")
      .crossJoin(dist(rawB).toDF("_rm", "_rtot"))
      .select(transform(sequence(lit(0), lit(buckets - 1)), b =>
        log((coalesce(element_at(col("_tm"), b), lit(0L)) + 1.0) /
          (col("_ttot") + buckets)) -
        log((coalesce(element_at(col("_rm"), b), lit(0L)) + 1.0) /
          (col("_rtot") + buckets))).as("_ratio"))
    val scored = rawB
      .crossJoin(broadcast(ratioRow))
      .select(col("id"),
        round(aggregate(
          transform(col("_buckets"), b => element_at(col("_ratio"), b + 1)),
          lit(0.0), (a, v) => a + v), 6).as("log_w"))
    // rank on the ROUNDED weight: near-equal raw sums may differ across
    // engines in the last ulps, and the selection boundary must not
    val picked = scored.orderBy(desc("log_w"), asc("id")).limit(n)
    picked.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(desc("log_w"), asc("id"))).cast("long"))
  }

  /** Curriculum order: a dense 1-based global POSITION for every doc
    * under `orderCols` (easy→hard for curriculum learning — Bengio
    * et al. 2009; in practice: by quality score, length, or LM
    * perplexity), tie-broken on `idCol` so the order is total and
    * engine-reproducible.
    *
    * A bare `row_number().over(Window.orderBy(…))` is the WORST
    * single-partition sort — no partition key at all, the entire
    * corpus through one task (Spark even warns). This rides
    * [[graft.ops.DistributedRank.withRankAndCumsum]]'s degenerate
    * one-group case instead: a constant group column makes range
    * partitioning alone bound every sort by corpus/parallelism and
    * the offsets collect is ≤ #partitions rows — the TeraSort shape,
    * same bit-identical rank contract the per-language call sites
    * pin. The ONE global pathology (every row one group) is exactly
    * the 90%-skew fixture's limit case, probed flat in ScaleProbe.
    *
    * CONTRACT (the ccnetBuckets convention): pass a PRE-PROJECTED
    * skinny frame — (id, difficulty…) only. The input rides the
    * checkpoint AND the range exchange, so a payload column (text,
    * embeddings) here pays both twice; rank the skinny frame and join
    * `position` back by id downstream if the payload is needed. */
  def curriculumOrder(df: DataFrame, idCol: String,
                      orderCols: Seq[Column]): DataFrame =
    graft.ops.DistributedRank.withRankAndCumsum(
        df.withColumn("_cg", lit(0)), "_cg",
        orderCols :+ col(idCol))
      .withColumn("position", col("_rk"))
      .drop("_cg", "_rk", "_n")

  /** R13 — DoReMi domain reweighting (Xie et al. 2023,
    * arXiv:2305.10429): mixture weights over data domains driven by
    * each domain's EXCESS LOSS — how much worse a generalist model
    * does on the domain than a domain-fit model, the "learnable
    * headroom" Group DRO up-weights. The paper's loop retrains a
    * proxy model between exponentiated-gradient steps; the engine
    * convention is deterministic, model-free gates (the m13/r8
    * precedent), so the loss stand-in is the hashed-n-gram bag
    * distribution the DSIR operator already uses: a domain's excess
    * loss is its docs' mean per-gram NLL under the CORPUS bucket
    * distribution minus under the domain's OWN —
    *
    *   excess_d = Σ_b (c_db / tot_d) · (ln p̂_d(b) − ln p̂(b))
    *
    * with add-one smoothing over the 256-bucket vocabulary, i.e. the
    * empirical per-token KL(domain ‖ corpus). One exponentiated-
    * gradient step from uniform with step size `eta` then gives
    *   w'_d = exp(eta · excess_d) / Σ_e exp(eta · excess_e)
    * and the paper's uniform smoothing
    *   w_d = (1 − smoothing) · w'_d + smoothing / K.
    * (With static losses, T EG steps are the single step at T·eta —
    * the closed form — so one step loses nothing a fixed proxy had.)
    *
    * Cross-engine parity: excess is rounded to 6 dp BEFORE the
    * exponential (the r8 rule — bucket-sum order differs between
    * engines in the last ulps and the softmax must not see that), and
    * the output weight is rounded after.
    *
    * Scale shape: tokenize + bucket map-side (ONE pass over text,
    * zero text on any exchange), one groupBy down to ≤ K·256 count
    * rows, then every remaining step is windows over that tiny frame
    * — corpus-size-independent past the first aggregate. NULL domains
    * group like any other value (no join to lose them). Output:
    * (domain, n_grams, excess, weight), one row per domain. */
  def doremiWeights(df: DataFrame, domainCol: String, textCol: String,
                    eta: Double = 10.0, smoothing: Double = 0.1)
      : DataFrame =
    doremiWeightsTokenized(df.select(col(domainCol).as("domain"),
      split(trim(col(textCol)), "\\s+").as("toks")), eta, smoothing)

  /** [[doremiWeights]] from a PRE-SPLIT (domain, toks) projection —
    * the dsirSelectTokenized convention: composites that already hold
    * the shared token frame (a Gopher stage, a census) feed it
    * directly, so the corpus is tokenized exactly once end-to-end
    * (re-tokenizing per stage is the dominant map cost at 100 TB). */
  def doremiWeightsTokenized(tok: DataFrame, eta: Double = 10.0,
                             smoothing: Double = 0.1): DataFrame = {
    val buckets = 256
    // widen-if-narrow before the gram+md5 map pass (the r8 rationale;
    // no-op on an already-wide input). Key on the token ARRAY hash, not
    // the domain — a handful of domains would hash to a handful of
    // partitions, re-creating the skew this exists to kill.
    val wideTok = graft.core.Tables.widenIfNarrowBy(tok, col("toks"))
    // EXPLODE grams first, md5 per gram ROW second: a Project over the
    // token arrays gets pushed below the widen exchange by the
    // optimizer (alias substitution through RepartitionByExpression),
    // which would run the whole md5 pass back in the single upstream
    // task — a Generate cannot sink through an exchange, so hashing
    // the generator's output pins the expensive part above it. Same
    // grams (shared gramsOf builder), same md5, same counts as
    // bucketing the array first.
    val cnt = wideTok
      .select(col("domain"), explode(gramsOf(col("toks"))).as("_g"))
      .select(col("domain"), gramBucket(col("_g")).as("_b"))
      .groupBy("domain", "_b").agg(count(lit(1)).as("_c"))
    // everything below runs over ≤ K·256 rows
    val wAll = Window.partitionBy()
    val wDom = Window.partitionBy("domain")
    val wBuck = Window.partitionBy("_b")
    val perDomain = cnt
      .withColumn("_totd", sum("_c").over(wDom))
      .withColumn("_cb", sum("_c").over(wBuck))
      .withColumn("_tot", sum("_c").over(wAll))
      .withColumn("_term",
        (col("_c") / col("_totd")) *
          (log((col("_c") + 1.0) / (col("_totd") + buckets)) -
           log((col("_cb") + 1.0) / (col("_tot") + buckets))))
      .groupBy("domain")
      .agg(first("_totd").as("n_grams"),
        round(sum("_term"), 6).as("excess"))
    perDomain
      .withColumn("_k", count(lit(1)).over(wAll))
      .withColumn("_e", exp(col("excess") * eta))
      .withColumn("weight",
        round((lit(1.0) - smoothing) * col("_e") / sum("_e").over(wAll)
          + lit(smoothing) / col("_k"), 6))
      .drop("_k", "_e")
  }

  /** The DoReMi weights APPLIED as a deterministic mixture draw: each
    * domain's quota is its weight's share of `totalTarget` (floored,
    * ≥ 1, capped at the domain's row count), rows picked by the
    * engine-portable md5 rank (the r4 quotaSample idiom — no RNG, so
    * resamples are stable across runs and engines). The per-domain
    * pick rides [[graft.ops.DistributedRank]] over the SKINNY
    * (domain, id) projection — in DoReMi the "domains" are data
    * sources and CommonCrawl is typically 60–80% of the mix, exactly
    * the dominant-group shape a plain domain-partitioned window would
    * single-task at crawl scale; text never enters the rank. */
  def doremiMix(df: DataFrame, domainCol: String, idCol: String,
                textCol: String, totalTarget: Int,
                eta: Double = 10.0, smoothing: Double = 0.1)
      : DataFrame =
    doremiMixTokenized(
        df.select(col(domainCol).as("domain"), col(idCol).as("id"),
          split(trim(col(textCol)), "\\s+").as("toks")),
        totalTarget, eta, smoothing)
      .select(col("domain").as(domainCol), col("id").as(idCol))

  /** [[doremiMix]] from a PRE-SPLIT (domain, id, toks) projection —
    * the weights consume the token arrays, the draw rank consumes
    * only the skinny (domain, id) slice (Catalyst prunes toks out of
    * that branch), so a composite holding the shared token frame runs
    * the whole weights+mix chain with zero re-tokenization. Output:
    * (domain, id), the selected rows. */
  def doremiMixTokenized(tok: DataFrame, totalTarget: Int,
                         eta: Double = 10.0, smoothing: Double = 0.1)
      : DataFrame = {
    val weights = doremiWeightsTokenized(tok.select("domain", "toks"),
        eta, smoothing)
      .select(col("domain"), col("weight"))
    val quotas = weights.withColumn("_quota",
      greatest(lit(1L),
        floor(lit(totalTarget.toDouble) * col("weight")).cast("long")))
    val ranked = graft.ops.DistributedRank.withRankAndCumsum(
      tok.select(col("domain"), col("id")), "domain",
      Seq(md5(col("id").cast("string").cast("binary")), col("id")))
    ranked.join(broadcast(quotas),
        ranked("domain") <=> quotas("domain"))
      .filter(col("_rk") <= col("_quota"))
      .select(ranked("domain"), col("id"))
  }

  /** Length-bucketed batch assignment — the padding-waste killer for
    * training: batching sequences of wildly different lengths pads
    * everything to the batch max, so throughput collapses (a 10-token
    * doc in a 2048-token batch is 99.5% pad FLOPs). The standard
    * remedy (T5's packing sibling; fairseq/HF `group_by_length`) is
    * to bucket by length class and batch within the bucket.
    *
    * Deterministic integer contract (both engines replay it exactly):
    *   n_tok   = non-empty whitespace tokens, floored at 1;
    *   bucket  = bit length of n_tok (n_tok ∈ [2^(b−1), 2^b − 1]);
    *   pad_to  = 2^bucket − 1, the bucket ceiling every sequence in
    *             the bucket pads to;
    *   batch_idx = (rank within bucket − 1) div batchSize, rank in
    *             ascending `idCol` order.
    * The within-bucket rank rides the DISTRIBUTED range rank: length
    * classes are few and Zipf-heavy (most web docs share 2-3
    * buckets), exactly the dominant-group shape a plain
    * `Window.partitionBy(bucket)` would single-task at crawl scale.
    */
  def lengthBucketBatches(df: DataFrame, idCol: String, textCol: String,
                          batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val nTok = greatest(
      size(filter(split(trim(col(textCol)), "\\s+"),
        t => length(t) > 0)).cast("long"), lit(1L))
    val base = df.select(col(idCol), nTok.as("n_tok"))
      .withColumn("bucket", length(bin(col("n_tok"))).cast("long"))
    graft.ops.DistributedRank.withRankAndCumsum(
        base, "bucket", Seq(col(idCol)))
      .select(col(idCol), col("n_tok"), col("bucket"),
        (pow(lit(2.0), col("bucket")).cast("long") - 1).as("pad_to"),
        expr(s"(_rk - 1) div ${batchSize}L").as("batch_idx"))
  }
}
