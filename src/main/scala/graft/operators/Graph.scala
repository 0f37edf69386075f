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
    * kernel).
    *
    * `redistributeDangling = true` adds the standard uniform dangling-
    * mass treatment real crawl graphs need (a large fraction of
    * fetched pages have no outlinks): each iteration sums the rank
    * sitting on out-degree-0 nodes — ONE scalar aggregate over skinny
    * rows, attached as a 1-row broadcast, never a driver action — and
    * every node receives mass (danglingSum div |V|) inside the damped
    * term, keeping the arithmetic integer-exact and replayable. OFF by
    * default: the closed synthetic gate graphs conserve mass by
    * construction, and the flag's cost is one extra anti-join + scalar
    * agg per iteration. Remaining deliberate simplification either
    * way: contributions addressed to ids absent from `nodes` vanish
    * (edges leaving the crawl frontier are dropped, not looped back),
    * and out-degree counts ALL outgoing edges including duplicates.
    *
    * Scale shape: each iteration is one src-keyed broadcast-or-shuffle
    * join plus one dst-keyed map-side-combinable sum over skinny
    * (id, long) rows — text/payload never enters; lineage is truncated
    * per iteration (localCheckpoint, the d6 label-propagation
    * convention) so the plan stays O(1) deep at any K.
    *
    * Overflow headroom, GUARDED at runtime: total scaled mass is
    * invariant-bounded by |V|·scale (Σpr' ≤ 0.15·|V|·scale +
    * 0.85·Σpr, fixed point |V|·scale), and the worst single
    * aggregation is 85·Σ — a star graph funnels everything into one
    * node — so |V|·scale must stay ≤ Long.MaxValue/85 ≈ 1.08e17. The
    * default scale 1e12 is safe to ~10⁵ nodes; drop `scale` one
    * decade per decade of nodes beyond that (1e10 at 10⁷ nodes, 1e8
    * at 10⁹ — still 8 digits of rank resolution). The guard costs one
    * count() on the skinny node frame and fails LOUDLY where the
    * wrapped Long would have silently corrupted every rank. */
  def linkRank(nodes: DataFrame, edges: DataFrame, idCol: String = "id",
               srcCol: String = "src", dstCol: String = "dst",
               iterations: Int = 3,
               scale: Long = 1000000000000L,
               redistributeDangling: Boolean = false): DataFrame = {
    require(iterations >= 1, s"iterations >= 1: $iterations")
    require(scale >= 100L, s"scale >= 100: $scale")
    val n = nodes.select(col(idCol).as("id"))
    val nV = nodes.count()
    require(nV <= Long.MaxValue / 85L / scale,
      s"linkRank overflow: |V|=$nV at scale=$scale exceeds the " +
        s"85*|V|*scale < 2^63 headroom (max |V| here: " +
        s"${Long.MaxValue / 85L / scale}); lower `scale` one decade " +
        "per decade of nodes")
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
      val joined = n.join(inMass, Seq("id"), "left")
      val next =
        if (!redistributeDangling)
          joined.select(col("id"),
            (lit(base) + expr(
              "(85 * coalesce(_s, CAST(0 AS BIGINT))) div 100")).as("pr"))
        else {
          // dangling mass: rank sitting on nodes with NO outgoing edge
          // — one scalar over skinny rows, broadcast back (the 1-row
          // crossJoin denominator-attach convention); each node's
          // damped term gains its uniform share, floor-divided so the
          // kernel stays integer-exact
          val dang = broadcast(ranks.join(deg, Seq("id"), "left_anti")
            .agg(coalesce(sum("pr"), lit(0L)).as("_d")))
          joined.crossJoin(dang)
            .select(col("id"),
              (lit(base) + expr(
                s"(85 * (coalesce(_s, CAST(0 AS BIGINT)) + (_d div " +
                  s"CAST($nV AS BIGINT)))) div 100")).as("pr"))
        }
      ranks = next.localCheckpoint()
    }
    ranks
  }
}
