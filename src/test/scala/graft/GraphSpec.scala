package graft

import org.apache.spark.sql.functions.{abs, col, count, lit, max}

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

  test("incremental refresh: warm start reaches the new graph's fixed " +
      "point in far fewer supersteps than from scratch, ranks equal at " +
      "tolerance") {
    // 10 hub-and-spoke clusters (hubs 0,10,..,90, leaves attached to
    // their hub) + a hub ring: the stationary distribution is far from
    // uniform (hubs concentrate mass), so a cold start pays the full
    // uniform→skewed gap. The delta moves ONE leaf to another hub —
    // the warm start's initial error is ~1/100 of the mass.
    val n = 200
    val nodes = (0L until n).toDF("node")
    def und(ps: Seq[(Long, Long)]) = (ps ++ ps.map(_.swap)).distinct
    val hubs = (0L until n by 10L).toSeq
    val spokes = (0L until n).filter(i => i % 10 != 0)
      .map(i => ((i / 10) * 10, i))
    val hubRing = hubs.indices.map(k => (hubs(k), hubs((k + 1) % hubs.size)))
    val oldEdges = und(spokes ++ hubRing).toDF("src", "dst")
    // delta: ONE new leaf–leaf edge inside hub 10's cluster — the
    // perturbed mass is two leaves' contributions, ~0.2% of the total
    val newSpokes = spokes :+ ((11L, 12L))
    val newEdges = und(newSpokes ++ hubRing).toDF("src", "dst")
    def degreed(e: org.apache.spark.sql.DataFrame) =
      e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), Seq("src"))
    // 1e-3 of total mass: the cold start covers the uniform→skewed gap
    // (~half the mass) in ~log_d of the ratio ≈ 35 steps; the warm start
    // only covers the one-leaf delta (~1% of mass) ≈ 14 steps
    val tol = Graph.Scale / 1000
    // previous graph's converged ranks = the warm-start seed
    val (prevRanks, _) =
      Graph.pagerankConverge(nodes, degreed(oldEdges), None, tol)
    val (fullRanks, fullIters) =
      Graph.pagerankConverge(nodes, degreed(newEdges), None, tol)
    val (refrRanks, refrIters) =
      Graph.pagerankConverge(nodes, degreed(newEdges), Some(prevRanks), tol)
    assert(refrIters * 2 <= fullIters,
      s"refresh should need at most half the supersteps ($refrIters vs $fullIters)")
    val maxDiff = refrRanks
      .join(fullRanks.select(col("node"), col("rank").as("full")), Seq("node"))
      .agg(max(abs(col("rank") - col("full")))).head().getLong(0)
    // each run stops with step-delta ≤ tol, so its distance to the fixed
    // point is ≤ tol·d/(1−d) ≈ 5.7·tol; the two results can differ by
    // twice that
    assert(maxDiff <= 12 * tol,
      s"refresh and from-scratch ranks diverge by $maxDiff (> ${12 * tol})")
  }

  test("warm start from the UNCHANGED graph's ranks converges almost " +
      "immediately (the no-delta fast path)") {
    val (nodes, edges) = triangleGraph
    def degreed(e: org.apache.spark.sql.DataFrame) =
      e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), Seq("src"))
    val tol = Graph.Scale / 100000
    val (r1, _) = Graph.pagerankConverge(nodes, degreed(edges), None, tol)
    val (_, iters) = Graph.pagerankConverge(nodes, degreed(edges), Some(r1), tol)
    assert(iters <= 2, s"no-delta refresh must stop in <= 2 supersteps, took $iters")
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

  test("incremental triangles: old artifact + delta wedges == full " +
      "recount, and the fixture delta actually contributes") {
    val full = Graph.triangles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val incr = Graph.trianglesIncr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(incr == full, s"incr diff: ${(incr diff full) ++ (full diff incr)}")
    // the gate is load-bearing only if the delta removes triangles from
    // the old graph: at least one full triangle must touch a delta edge
    val touched = full.exists { case (a, b, c) =>
      Seq((a, b), (b, c), (a, c)).exists { case (x, y) =>
        ((x + y) % 37 + 37) % 37 == 0 }
    }
    assert(touched, "fixture delta touches no triangle — gate vacuous")
  }
}
