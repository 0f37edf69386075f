package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Per-group quota sample: keep `quota` rows per group, selected by a
    * deterministic pseudo-random rank — md5 of the key's string form, so
    * the selection is reproducible across runs, partitionings, AND
    * engines (md5 is cross-engine comparable where xxhash64 is not; the
    * key tiebreak covers md5 collisions). The standard corpus-balancing
    * step: cap each language/source/domain at a fixed share. One shuffle
    * on the group column; rank + filter is window-local. */
  def quotaSample(df: DataFrame, groupCol: String, keyCol: String,
                  quota: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(md5(col(keyCol).cast("string").cast("binary")), col(keyCol))
    df.withColumn("_qrk", row_number().over(w))
      .filter(col("_qrk") <= quota)
      .drop("_qrk")
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
    * the corpus into one partition; per-shard windows run one task PER
    * SHARD — that is the honest parallelism bound of the rank, so pick
    * nShards ≈ the trainer-worker/output-file count the shuffle feeds
    * (each worker consumes its shard in pos order anyway, so the
    * per-shard sort is work the pipeline owes regardless). Output adds
    * (shard, pos). nShards must DIVIDE 16: the hex digit is uniform
    * over 16 values, so digit mod a non-divisor (e.g. 12) would load
    * some shards with exactly 2× the documents of others. */
  def shuffleShard(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(Set(1, 2, 4, 8, 16).contains(nShards),
      s"nShards must divide 16 (1/2/4/8/16) for uniform shards, got $nShards")
    // project the digest ONCE — shard digit and order key both read it,
    // and a repeated md5 expression would hash every row twice
    val withHex = df.withColumn("_hex",
      md5(col(keyCol).cast("string").cast("binary")))
    val shard = pmod(
      (instr(lit("0123456789abcdef"), substring(col("_hex"), 1, 1)) - 1)
        .cast("long"),
      lit(nShards.toLong))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard")
      .orderBy(substring(col("_hex"), 2, 31), col(keyCol))
    withHex.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_hex")
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
    * stays distributed and broadcasts back), then one window shuffle on
    * the group column — identical cost to `quotaSample`. */
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
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(md5(col(keyCol).cast("string").cast("binary")), col(keyCol))
    df.join(broadcast(quotas), Seq(groupCol))
      .withColumn("_qrk", row_number().over(w))
      .filter(col("_qrk") <= col("_quota"))
      .drop("_qrk", "_quota")
  }
}
