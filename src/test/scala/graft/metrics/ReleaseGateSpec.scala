package graft.metrics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReleaseGateSpec extends SparkSpec {
  import spark.implicits._
  import ReleaseGate._

  private def delta(src: String, lang: String, nE: Long, nA: Long,
                    dE: Long = 0L, dA: Long = 0L) =
    GroupDelta(src, lang, nE, nA, dE, dA)

  test("shouldAcceptSnapshot: stable psi + stable mix accepts") {
    val v = shouldAcceptSnapshot(0.02, Seq(
      delta("web", "en", 1000, 1100), delta("web", "de", 500, 520)))
    assert(v.accept && v.band == "stable")
  }

  test("shouldAcceptSnapshot: psi in the act band is a hard reject") {
    val v = shouldAcceptSnapshot(0.30, Seq(delta("web", "en", 1000, 1000)))
    assert(!v.accept && v.band == "act")
    assert(v.reasons.exists(_.contains("act band")))
  }

  test("shouldAcceptSnapshot: a vanished (source, lang) group is a hard reject") {
    val v = shouldAcceptSnapshot(0.01, Seq(
      delta("web", "en", 1000, 1000), delta("books", "en", 200, 0)))
    assert(!v.accept && v.reasons.exists(_.contains("vanished")))
  }

  test("shouldAcceptSnapshot: a share collapse past tolerance is a hard reject") {
    // books/en falls from 1/3 of the mix to ~4% — past the 50% drop
    // tolerance even though the group still exists
    val v = shouldAcceptSnapshot(0.01, Seq(
      delta("web", "en", 1000, 1000), delta("books", "en", 500, 40)))
    assert(!v.accept && v.reasons.exists(_.contains("share collapsed")))
  }

  test("shouldAcceptSnapshot: a dup-rate jump is a hard reject") {
    // dup rate 1% -> 40%: the crawler started re-fetching
    val v = shouldAcceptSnapshot(0.01, Seq(
      delta("web", "en", 1000, 1000, dE = 10, dA = 400)))
    assert(!v.accept && v.reasons.exists(_.contains("dup rate jumped")))
  }

  test("shouldAcceptSnapshot: the watch band escalates only with soft card evidence") {
    // watch-band psi, card quiet -> accept (the m8 'monitor' reading)
    val quiet = shouldAcceptSnapshot(0.15, Seq(
      delta("web", "en", 1000, 1050)))
    assert(quiet.accept && quiet.band == "watch")
    // same psi + a brand-new group (soft evidence) -> reject
    val loud = shouldAcceptSnapshot(0.15, Seq(
      delta("web", "en", 1000, 1050), delta("social", "en", 0, 300)))
    assert(!loud.accept && loud.reasons.exists(_.contains("appeared")))
    // soft evidence alone in the STABLE band stays an accept — new
    // groups are normal crawl growth unless the distribution also moved
    val stable = shouldAcceptSnapshot(0.02, Seq(
      delta("web", "en", 1000, 1050), delta("social", "en", 0, 300)))
    assert(stable.accept)
  }

  test("snapshotDiff classifies added/removed/changed/same per doc") {
    val oldSnap = Seq(
      (1L, Some("kept exactly")), (2L, Some("will change")),
      (3L, Some("will be removed")), (4L, Some("Reformat  ONLY")),
      (6L, Option.empty[String])).toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, Some("kept exactly")), (2L, Some("has changed")),
      (5L, Some("brand new")), (4L, Some("reformat only")),
      (6L, Option.empty[String])).toDF("doc_id", "text")
    val out = ReleaseGate.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "same", 2L -> "changed", 3L -> "removed",
      5L -> "added", 4L -> "same", 6L -> "same"),
      s"canonical-fp reformat rule + null-text docs present on both sides " +
        s"must classify same, not added/removed: $out")
  }

  test("incrementalReprocess: process touches ONLY the moved sliver, result ≡ full") {
    val oldSnap = Seq(
      (1L, "kept exactly as it was"), (2L, "this doc will change"),
      (3L, "this doc gets removed"), (4L, "another keeper doc here"))
      .toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, "kept exactly as it was"), (2L, "this doc HAS changed"),
      (4L, "another keeper doc here"), (5L, "a brand new arrival"))
      .toDF("doc_id", "text")
    // the per-doc pipeline, instrumented: count every row it is asked
    // to process (per-doc pure — token count + a flag)
    var processedIds: Set[Long] = Set.empty
    def proc(df: org.apache.spark.sql.DataFrame) = {
      processedIds = df.select("doc_id").as[Long].collect().toSet
      df.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_toks"))
    }
    val baseOld = oldSnap.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_toks"))
    val out = ReleaseGate.incrementalReprocess(
        oldSnap, newSnap, baseOld, "doc_id", "text")(proc)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // only changed (2) and added (5) were reprocessed
    assert(processedIds == Set(2L, 5L),
      s"process must see only changed+added docs, saw $processedIds")
    // the result equals the full recompute over the new snapshot
    val full = newSnap.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_toks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == full, s"incremental must equal full recompute: $out vs $full")
  }

  test("snapshotGate end-to-end: stable snapshot accepts, polluted rejects") {
    val stop = Seq("the", "a", "of")
    def mkDocs(ids: Range, dupEvery: Int): org.apache.spark.sql.DataFrame =
      ids.map { i =>
        val txt =
          if (dupEvery > 0 && i % dupEvery == 0) "the same boilerplate page of text"
          else s"the document number $i speaks of topic ${i % 7} a while"
        (i.toLong, txt, s"src${i % 2}", if (i % 3 == 0) "de" else "en")
      }.toDF("doc_id", "text", "source", "lang")
    val expected = mkDocs(0 until 400, 0)
    // stable: same generator, disjoint ids, same mix
    val stableActual = mkDocs(400 until 800, 0)
    val g1 = snapshotGate(expected, stableActual, "doc_id", "text",
      "source", "lang", stop)
    val r1 = g1.select("accept", "psi").distinct().collect()
    assert(r1.length == 1 && r1.head.getLong(0) == 1L,
      s"stable snapshot must accept, got ${r1.mkString}")
    // polluted: a third of the crawl is one re-fetched page -> the
    // dup-rate hard rule (and the quality distribution shifts too)
    val polluted = mkDocs(400 until 800, 3)
    val g2 = snapshotGate(expected, polluted, "doc_id", "text",
      "source", "lang", stop)
    assert(g2.select("accept").distinct().as[Long].collect().head == 0L,
      "dup-flooded snapshot must reject")
    // evidence frame carries both sides' counts for every group
    assert(g2.columns.toSeq == Seq("source", "lang", "n_docs_e", "n_docs_a",
      "dup_docs_e", "dup_docs_a", "psi", "accept"))
    assert(g2.agg(sum("n_docs_e")).as[Long].collect().head == 400L)
    assert(g2.agg(sum("n_docs_a")).as[Long].collect().head == 400L)
  }
}
