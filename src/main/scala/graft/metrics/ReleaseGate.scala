package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-snapshot RELEASE GATE — the measure→decide→act closure for
  * the text pipeline (the IVF rebuild policy's pattern,
  * [[graft.operators.Similarity.shouldRebuildIvf]], applied to corpus
  * publishing): before a crawl-over-crawl snapshot is declared
  * trainable, compare its corpus card (per-(source, lang) datasheet —
  * Gebru et al. 2021) and its quality-score distribution (PSI over the
  * previous snapshot's deciles, the m14 monitor) against the accepted
  * snapshot, and produce ONE accept/reject decision.
  *
  * PSI bands follow the standard credit-scoring interpretation the m8
  * operator already uses: < 0.1 no shift, 0.1–0.25 watch (accept only
  * when the card corroborates stability), ≥ 0.25 act (reject).
  * Card rules: a (source, lang) group VANISHING is a hard reject (a
  * whole slice of the mix fell out of the crawl); a group's share of
  * the snapshot collapsing past `maxShareDropFrac` is a hard reject
  * (shares, not absolute counts — snapshots legitimately differ in
  * size, it is the MIX that must hold); the exact-dup rate jumping by
  * more than `maxDupRateIncrease` is a hard reject (the crawler
  * started re-fetching); a group appearing or moving by more than
  * `softShareChangeFrac` is the soft evidence that escalates the PSI
  * watch band into a reject.
  *
  * Scale shape: the two cards are groups-sized aggregates
  * ([[graft.operators.TextAnalysis.corpusCard]] — skew-immune count +
  * join-back), PSI is one break aggregate + one bucket-count pass
  * ([[Psi.psi]]); the decision itself runs over the collected card
  * diff — a bounded driver fetch by construction (groups, not docs),
  * the modes/confusion-matrix convention.
  */
object ReleaseGate {

  /** One (source, lang) group's card delta between snapshots; absent
    * groups carry zero counts on their absent side. */
  case class GroupDelta(source: String, lang: String,
                        nDocsE: Long, nDocsA: Long,
                        dupDocsE: Long, dupDocsA: Long)

  case class Tolerances(maxShareDropFrac: Double = 0.5,
                        maxDupRateIncrease: Double = 0.10,
                        softShareChangeFrac: Double = 0.25)

  case class Verdict(accept: Boolean, band: String, reasons: Seq[String])

  /** Doc-level SNAPSHOT DIFF — what changed between two crawls: a
    * full-outer join of the two snapshots' (id, content-fingerprint)
    * projections classifies every doc as added / removed / changed /
    * same. The per-doc companion to [[snapshotGate]]'s aggregate
    * verdict: the gate says whether to accept, the diff says WHAT
    * moved (feed `changed` + `added` downstream as the incremental
    * processing set — only those docs need re-cleaning/re-embedding).
    * Scale shape: one id-keyed shuffle of skinny (id, fp) rows — the
    * text never moves; the fingerprint is the same canonical form the
    * dedup family keys on, so a reformatting-only edit counts as
    * `same`, exactly like the dedup keeper rule would. */
  def snapshotDiff(expected: DataFrame, actual: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    import graft.operators.TextAnalysis
    // presence is tested with explicit markers, NOT fingerprint
    // nullability: a doc with NULL text fingerprints to NULL, and
    // using that as the absence signal would misclassify null-text
    // docs as added/removed while they are present on both sides
    val e = expected.select(col(idCol).as("id"),
      TextAnalysis.fingerprint(col(textCol)).as("_fp_e"),
      lit(true).as("_in_e"))
    val a = actual.select(col(idCol).as("id"),
      TextAnalysis.fingerprint(col(textCol)).as("_fp_a"),
      lit(true).as("_in_a"))
    e.join(a, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("_in_e").isNull, "added")
          .when(col("_in_a").isNull, "removed")
          .when(col("_fp_e") <=> col("_fp_a"), "same")
          .otherwise("changed").as("status"))
  }

  /** INCREMENTAL REPROCESSING driven by [[snapshotDiff]] — the
    * engine's answer to a weekly crawl catchup: instead of re-running
    * a per-doc pipeline over the whole new snapshot, carry forward
    * the already-computed outputs for `same` docs, run `process` on
    * ONLY the changed+added docs, and drop removed docs' outputs.
    *
    * Contract: `process` must be PER-DOC pure (output row i depends
    * only on input row i — cleaning, scoring, feature extraction;
    * NOT corpus-relative ops like DSIR or the CCNet thirds), and its
    * output must carry `idCol`. Under that contract incremental ≡
    * full recompute EXACTLY — the m16 oracle pins it. Note the
    * `same` classification keys on the CANONICAL content fingerprint
    * (the dedup keeper rule): a formatting-only edit carries its OLD
    * output forward. A `process` whose values are sensitive to
    * formatting below the canonical form should treat that as
    * approximation or diff on a byte-exact fingerprint instead.
    *
    * Scale shape: the diff is one id-keyed shuffle of skinny
    * (id, fp) rows; carried outputs ride a left-semi join on ids;
    * `process` touches only the moved sliver — the whole point at
    * 100 TB, where week-over-week movement is a few percent of the
    * corpus. */
  def incrementalReprocess(oldSnap: DataFrame, newSnap: DataFrame,
                           oldOutput: DataFrame, idCol: String,
                           textCol: String)
                          (process: DataFrame => DataFrame): DataFrame = {
    val diff = snapshotDiff(oldSnap, newSnap, idCol, textCol)
      .localCheckpoint() // two consumers of one skinny (id, status) frame
    val moved = diff.filter(col("status").isin("added", "changed"))
      .select(col("id").as(idCol))
    val same = diff.filter(col("status") === "same")
      .select(col("id").as(idCol))
    val carried = oldOutput.join(same, Seq(idCol), "left_semi")
    val recomputed = process(newSnap.join(moved, Seq(idCol), "left_semi"))
    carried.unionByName(recomputed)
  }

  /** The decision rule as a pure, spec-pinnable function (the
    * shouldRebuildIvf pattern). Reject iff: PSI ≥ `psiAct`; OR any
    * hard card failure (group vanished / share collapsed / dup-rate
    * jump); OR PSI in the watch band [`psiWatch`, `psiAct`) WITH soft
    * card evidence (group appeared or share moved past the soft
    * tolerance). Accept otherwise. */
  def shouldAcceptSnapshot(psi: Double, deltas: Seq[GroupDelta],
                           tol: Tolerances = Tolerances(),
                           psiWatch: Double = 0.1,
                           psiAct: Double = 0.25): Verdict = {
    val totE = deltas.map(_.nDocsE).sum.toDouble
    val totA = deltas.map(_.nDocsA).sum.toDouble
    def shareE(d: GroupDelta) = if (totE == 0) 0.0 else d.nDocsE / totE
    def shareA(d: GroupDelta) = if (totA == 0) 0.0 else d.nDocsA / totA
    val hard = Seq.newBuilder[String]
    val soft = Seq.newBuilder[String]
    if (psi >= psiAct) hard += f"psi $psi%.6f >= $psiAct (act band)"
    deltas.foreach { d =>
      val key = s"${d.source}/${d.lang}"
      if (d.nDocsE > 0 && d.nDocsA == 0)
        hard += s"group $key vanished"
      else if (d.nDocsE > 0 &&
        shareA(d) < shareE(d) * (1 - tol.maxShareDropFrac))
        hard += s"group $key share collapsed (${d.nDocsE} -> ${d.nDocsA})"
      val dupRateE = if (d.nDocsE == 0) 0.0 else d.dupDocsE.toDouble / d.nDocsE
      val dupRateA = if (d.nDocsA == 0) 0.0 else d.dupDocsA.toDouble / d.nDocsA
      if (d.nDocsE > 0 && dupRateA - dupRateE > tol.maxDupRateIncrease)
        hard += f"group $key dup rate jumped ($dupRateE%.4f -> $dupRateA%.4f)"
      if (d.nDocsE == 0 && d.nDocsA > 0)
        soft += s"group $key appeared"
      else if (d.nDocsE > 0 &&
        math.abs(shareA(d) - shareE(d)) > tol.softShareChangeFrac * shareE(d))
        soft += s"group $key share moved past soft tolerance"
    }
    val hardR = hard.result(); val softR = soft.result()
    val band =
      if (psi >= psiAct) "act"
      else if (psi >= psiWatch) "watch" else "stable"
    val accept = hardR.isEmpty && !(band == "watch" && softR.nonEmpty)
    val reasons =
      if (accept) Seq(s"psi band $band, card within tolerance")
      else hardR ++ (if (band == "watch") softR else Nil)
    Verdict(accept, band, reasons)
  }

  /** End-to-end gate over two document snapshots: computes both sides'
    * card counts, the quality-PSI between the snapshots, runs
    * [[shouldAcceptSnapshot]], and emits the oracle-able evidence
    * frame — one row per (source, lang) with both snapshots' doc/dup
    * counts, plus the psi and the verdict as constant columns.
    *
    * Each snapshot's text is scanned ONCE: a skinny (source, lang,
    * fingerprint, quality) projection is materialized eagerly and
    * feeds the card aggregate AND the PSI pass — tokenize+quality is
    * the dominant map cost at scale and must not be paid per
    * consumer. The card diff is likewise localCheckpoint'd: it feeds
    * the bounded driver collect (the decision) and the emitted
    * frame. */
  def snapshotGate(expected: DataFrame, actual: DataFrame,
                   idCol: String, textCol: String,
                   srcCol: String, langCol: String,
                   stopwords: Seq[String],
                   tol: Tolerances = Tolerances()): DataFrame = {
    import graft.operators.TextAnalysis
    def sideBase(df: DataFrame): DataFrame =
      df.select(col(srcCol).as("source"), col(langCol).as("lang"),
        TextAnalysis.fingerprint(col(textCol)).as("_fp"),
        TextAnalysis.qualityScore(col(textCol), stopwords).as("q"))
        .localCheckpoint()
    val baseE = sideBase(expected)
    val baseA = sideBase(actual)
    // the card counts the gate consumes, from the shared projection —
    // the corpusCard dup rule (fp multiplicity per side, NULL-safe)
    def card(base: DataFrame, suffix: String): DataFrame = {
      val fpc = base.groupBy("_fp").agg(count(lit(1)).as("_fpc"))
        .withColumnRenamed("_fp", "_fpk")
      base.join(fpc, col("_fp") <=> col("_fpk"), "left")
        .groupBy("source", "lang")
        .agg(count(lit(1)).as(s"n_docs_$suffix"),
          sum(when(col("_fpc") > 1, 1L).otherwise(0L))
            .as(s"dup_docs_$suffix"))
    }
    val diff = card(baseE, "e")
      .join(card(baseA, "a"), Seq("source", "lang"), "full_outer")
      .select(col("source"), col("lang"),
        coalesce(col("n_docs_e"), lit(0L)).as("n_docs_e"),
        coalesce(col("n_docs_a"), lit(0L)).as("n_docs_a"),
        coalesce(col("dup_docs_e"), lit(0L)).as("dup_docs_e"),
        coalesce(col("dup_docs_a"), lit(0L)).as("dup_docs_a"))
      .localCheckpoint()
    val deltas = diff.collect().map(r => GroupDelta(
      r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // one row; the same 6-dp-rounded PSI the m14 gate pins — over the
    // SAME materialized quality column the cards read
    val psiVal = Psi.psi(baseE.select("q"), baseA.select("q"), "q")
      .first().getDouble(0)
    val verdict = shouldAcceptSnapshot(psiVal, deltas, tol)
    diff
      .withColumn("psi", lit(psiVal))
      .withColumn("accept", lit(if (verdict.accept) 1L else 0L))
      .orderBy("source", "lang")
  }
}
