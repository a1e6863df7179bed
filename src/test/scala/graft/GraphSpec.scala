package graft

import graft.ops.Graph

/** PageRank semantics on hand-computable graphs. All arithmetic is
  * fixed-point integer (Graph.Scale units), so expected values are exact —
  * no tolerance needed. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** nodes 1..4: triangle {1,2,3} (undirected) + isolated node 4. */
  private def triangleGraph = {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val undirected = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val edges = (undirected ++ undirected.map(_.swap)).toDF("src", "dst")
    (nodes, edges)
  }

  test("triangle nodes conserve mass; isolated node keeps the teleport floor") {
    val (nodes, edges) = triangleGraph
    val ranks = Graph.pagerankOnGraph(nodes, edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // n=4: base = Scale/4; triangle is symmetric and 2-regular, so each
    // node's inbound contribution is exactly its own rank (2 * rank/2):
    //   r' = 15%*base + 85%*r  with r0 = base  =>  r stays base forever.
    val base = Graph.Scale / 4
    val teleport = 15L * base / 100
    assert(ranks(1L) == base && ranks(2L) == base && ranks(3L) == base)
    // isolated node: no inbound edges => teleport floor from iteration 1
    assert(ranks(4L) == teleport)
  }

  test("a hub accumulates more rank than leaves, and totals never exceed the mass") {
    // star: leaves 2..5 <-> hub 1 (undirected)
    val nodes = (1L to 5L).toDF("node")
    val spokes = (2L to 5L).map(l => (1L, l))
    val edges = (spokes ++ spokes.map(_.swap)).toDF("src", "dst")
    val ranks = Graph.pagerankOnGraph(nodes, edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hub = ranks(1L)
    (2L to 5L).foreach(l => assert(hub > ranks(l), s"hub <= leaf $l"))
    assert(ranks.values.sum <= Graph.Scale)
    // leaves are symmetric: identical ranks
    assert((2L to 5L).map(ranks).toSet.size == 1)
  }

  test("pagerank is deterministic across runs") {
    val (nodes, edges) = triangleGraph
    val a = Graph.pagerankOnGraph(nodes, edges, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Graph.pagerankOnGraph(nodes, edges, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("triangle enumeration closes wedges exactly once, canonically ordered") {
    val tris = Graph.triangles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tris.forall { case (a, b, c) => a < b && b < c },
      "triangles must come out strictly increasing (each found once)")
    assert(tris.distinct.length == tris.length)
    // cross-check against a driver-side closure of the exact pair set
    val pairs = graft.ops.Dedup.ngramJaccard(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = pairs.toSeq.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val brute = for {
      a <- nodes; b <- nodes if a < b && pairs((a, b))
      c <- nodes if b < c && pairs((b, c)) && pairs((a, c))
    } yield (a, b, c)
    assert(tris.toSet == brute.toSet)
  }
}
