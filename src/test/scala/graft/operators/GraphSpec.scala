package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // 3-node graph: 1 -> {2, 3}, 2 -> {3}, 3 -> {1}
  private def fixture = (
    Seq(1L, 2L, 3L).toDF("id"),
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst"))

  test("linkRank: one iteration matches the hand-computed integer kernel") {
    val (nodes, edges) = fixture
    val S = 1000000000000L
    val got = Graph.linkRank(nodes, edges, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // contribs: node1 deg 2 -> S/2 to 2 and 3; node2 deg 1 -> S to 3;
    // node3 deg 1 -> S to 1
    val base = 15L * S / 100L
    val expected = Map(
      1L -> (base + 85L * S / 100L),
      2L -> (base + 85L * (S / 2) / 100L),
      3L -> (base + 85L * (S / 2 + S) / 100L))
    assert(got == expected, s"got $got want $expected")
  }

  test("linkRank: iterating concentrates rank on the sink-heavy node, mass stays sane") {
    val (nodes, edges) = fixture
    val r3 = Graph.linkRank(nodes, edges, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 3 has two in-links (one from the high-rank cycle), node 2 one
    assert(r3(3L) > r3(2L), s"3 collects more in-mass than 2: $r3")
    // every rank keeps the teleport floor and total mass stays below
    // the closed-graph ceiling (floor division only sheds mass)
    assert(r3.values.forall(_ >= 15L * 1000000000000L / 100L))
    assert(r3.values.sum <= 3L * 1000000000000L)
  }

  test("linkRank: contributions to ids outside the node set vanish") {
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq((1L, 2L), (1L, 99L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.linkRank(nodes, edges, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val S = 1000000000000L
    val base = 15L * S / 100L
    // node1 deg 2 (the edge to missing 99 still counts toward degree);
    // only S/2 reaches node 2, 99's share is dropped
    assert(got == Map(1L -> (base + 85L * S / 100L),
      2L -> (base + 85L * (S / 2) / 100L)), s"got $got")
  }

  test("linkRank: dangling mass redistributes uniformly, integer-exactly") {
    // 1 -> 2, 2 -> 1, 3 dangling: without redistribution node 3 only
    // ever keeps the teleport floor and its initial mass evaporates
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val S = 1000000000000L
    val base = 15L * S / 100L
    val off = Graph.linkRank(nodes, edges, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(off(3L) == base, s"dropped mass: 3 keeps only the floor: $off")
    val on = Graph.linkRank(nodes, edges, iterations = 1,
        redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // dangling sum = S (node 3's initial rank), per-node share S div 3
    val share = S / 3L
    val expected = Map(
      1L -> (base + 85L * (S + share) / 100L),
      2L -> (base + 85L * (S + share) / 100L),
      3L -> (base + 85L * share / 100L))
    assert(on == expected, s"got $on want $expected")
    // and total mass is (nearly) conserved instead of losing S
    assert(on.values.sum > off.values.sum + 8L * S / 10L)
  }

  test("linkRank: overflow headroom guard fails loudly, not silently wrapped") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    // max |V| at this scale is Long.MaxValue/85/scale = 3 < 4 nodes
    val scale = Long.MaxValue / 85L / 3L
    val e = intercept[IllegalArgumentException] {
      Graph.linkRank(nodes, edges, iterations = 1, scale = scale)
    }
    assert(e.getMessage.contains("overflow"), e.getMessage)
  }
}
