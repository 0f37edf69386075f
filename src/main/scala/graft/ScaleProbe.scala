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

    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      "d1_exact" -> (d => Dedup.exactDedup(d, "doc_id", "text")),
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
      // pruning (a bare count would skip the rewrite expressions and
      // time only the join skeleton)
      "d13_dedup_rewrite" -> (d => Dedup.removeDupSpans(d, "doc_id", "text",
        n = 5).agg(sum(length(col("clean_text"))).as("chars_kept"),
          sum(col("n_kept")).as("toks_kept"))),
      // batch-vs-corpus near-dup: the batch (1/5 of docs) rides LSH
      // buckets against the corpus — cost should track corpus size
      // linearly (bucket join), never corpus²
      "d10_incremental" -> (d => Dedup.incrementalNearDup(
        d.filter(col("doc_id") % 5 === 0), d.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text")),
      "t2_quality" -> (d => d.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text"),
          Seq("the", "a", "of", "and", "is", "to", "in")).as("q"))),
      "t5_tfidf" -> (d => TextAnalysis.tfIdf(d, "doc_id", "text")))

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
