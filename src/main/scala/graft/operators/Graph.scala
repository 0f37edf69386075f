package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality — the crawl-quality prior a pretraining
  * pipeline joins onto documents (the CommonCrawl page-rank /
  * harmonic-centrality signal C4/RefinedWeb-era curation weights by).
  */
object Graph {

  /** Integer-exact PageRank (Page et al. 1999): `iterations` fixed
    * Jacobi steps of
    *
    *   pr' = (15·scale) div 100 + (85·Σ_{src→me} (pr_src div deg_src)) div 100
    *
    * in ALL-INTEGER arithmetic — ranks scaled by `scale`, floor
    * division everywhere — so the distributed sums carry no float
    * order sensitivity and ANY engine replays the result bit-exactly
    * (the md5-rank-draw portability discipline applied to an iterative
    * kernel). Deliberate simplifications, both documented properties
    * of the arithmetic rather than knobs: contributions addressed to
    * ids absent from `nodes` vanish (dangling mass is dropped, not
    * redistributed), and out-degree counts ALL outgoing edges
    * including duplicates.
    *
    * Scale shape: each iteration is one src-keyed broadcast-or-shuffle
    * join plus one dst-keyed map-side-combinable sum over skinny
    * (id, long) rows — text/payload never enters; lineage is truncated
    * per iteration (localCheckpoint, the d6 label-propagation
    * convention) so the plan stays O(1) deep at any K. Overflow
    * headroom: 85·Σpr ≤ 85·|V|·scale must stay below 2⁶³ — the default
    * scale 1e12 is safe past 10⁷ nodes; drop `scale` one decade per
    * decade of nodes beyond that (rank resolution trades off
    * explicitly). */
  def linkRank(nodes: DataFrame, edges: DataFrame, idCol: String = "id",
               srcCol: String = "src", dstCol: String = "dst",
               iterations: Int = 3,
               scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, s"iterations >= 1: $iterations")
    val n = nodes.select(col(idCol).as("id"))
    val deg = edges.groupBy(col(srcCol).as("id"))
      .agg(count(lit(1)).as("_deg"))
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("id"))
    val base = 15L * scale / 100L
    var ranks = n.select(col("id"), lit(scale).as("pr")).localCheckpoint()
    (1 to iterations).foreach { _ =>
      val contribs = ranks.join(deg, Seq("id"))
        .select(col("id").as("_src"), expr("pr div _deg").as("_c"))
      val inMass = e.join(contribs, Seq("_src"))
        .groupBy("id").agg(sum("_c").as("_s"))
      ranks = n.join(inMass, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(
            "(85 * coalesce(_s, CAST(0 AS BIGINT))) div 100")).as("pr"))
        .localCheckpoint()
    }
    ranks
  }
}
