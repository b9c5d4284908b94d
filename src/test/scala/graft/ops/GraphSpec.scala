package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val FP = Graph.RankFp

  /** Undirected path 1–2–3 as a directed edge list. */
  private def pathEdges =
    Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")

  test("pageRankFixedPoint: one iteration of the 3-path, hand-computed") {
    // r0 = FP div 3 = 333333333333 each; deg = (1, 2, 1)
    // teleport = ((FP div 3) * 15) div 100 = 49999999999
    // node 2 receives full rank from both leaves: s = 666666666666
    //   r1(2) = 49999999999 + (s * 85) div 100 = 616666666665
    // leaves receive half of node 2's rank: s = 166666666666
    //   r1(leaf) = 49999999999 + (s * 85) div 100 = 191666666665
    val out = Graph.pageRankFixedPoint(pathEdges, iters = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((1L, 191666666665L)))
    assert(out(2L) == ((2L, 616666666665L)))
    assert(out(3L) == ((1L, 191666666665L)))
  }

  test("pageRankFixedPoint: mass conservation and positivity at 3 iterations") {
    // ring of 8 plus chords — every node has out-degree >= 2
    val ring = (0L until 8L).flatMap { i =>
      Seq((i, (i + 1) % 8), ((i + 1) % 8, i), (i, (i + 4) % 8))
    }.toDF("src", "dst")
    val ranks = Graph.pageRankFixedPoint(ring, iters = 3)
      .select(col("rank_fp")).as[Long].collect()
    assert(ranks.length == 8)
    assert(ranks.forall(_ > 0L))
    val total = ranks.sum
    // integer divisions only ever DROP sub-unit dust: the total never
    // exceeds FP and loses at most a few hundred units per node
    assert(total <= FP)
    assert(total >= FP - 8 * 300L)
  }

  test("pageRankFixedPoint: result is partitioning-independent") {
    val a = Graph.pageRankFixedPoint(pathEdges, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    val b = Graph.pageRankFixedPoint(pathEdges.repartition(7), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(a == b)
  }

  test("pageRankConverged: dangling sinks receive domain membership and redistribute mass") {
    // 1 -> 2, 1 -> 3: nodes 2 and 3 are SINKS (out-degree 0).
    // r0 = FP div 3 = 333333333333; teleport = 49999999999
    // iter 1: D = r0(2) + r0(3) = 666666666666, D div 3 = 222222222222
    //   r1(1) = teleport + ((0 + 222222222222) * 85) div 100
    //         = 49999999999 + 188888888888 = 238888888887
    //   r1(2) = r1(3) = teleport + ((166666666666 + 222222222222) * 85) div 100
    //         = 49999999999 + 330555555554 = 380555555553
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val (df, used) = Graph.pageRankConverged(edges, maxIters = 1)
    val out = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(used == 1)
    assert(out(1L) == ((2L, 238888888887L)))
    assert(out(2L) == ((0L, 380555555553L)))
    assert(out(3L) == ((0L, 380555555553L)))
    // dangling redistribution keeps the mass in the system (minus
    // integer-division dust) — without it ~2/3 of it would vanish here
    val total = out.values.map(_._2).sum
    assert(total <= FP && total >= FP - 3 * 300L)
  }

  test("pageRankConverged: matches pageRankFixedPoint on a dangling-free graph") {
    val a = Graph.pageRankFixedPoint(pathEdges, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    val (df, _) = Graph.pageRankConverged(pathEdges, maxIters = 3)
    val b = df.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(a == b)
  }

  test("pageRankConverged: stops at the exact integer fixed point before maxIters") {
    // damping = 1: differences contract 100x per iteration, so the
    // integer fixed point is reached in a handful of rounds — the loop
    // must detect max|dr| = 0 and exit long before the 50-iteration cap
    val (df, used) = Graph.pageRankConverged(pathEdges, maxIters = 50, damping = 1)
    assert(used < 15, s"expected early convergence, ran $used iterations")
    // and the early exit is a true fixed point: one more iteration from
    // the converged state changes nothing
    val again = Graph.pageRankConverged(pathEdges, maxIters = used + 1, damping = 1)
    assert(again._2 == used)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq ==
      again._1.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq)
  }

  test("pageRankFixedPoint: validates its parameters") {
    intercept[IllegalArgumentException] {
      Graph.pageRankFixedPoint(pathEdges, iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRankFixedPoint(pathEdges, iters = 1, damping = 100)
    }
  }

  test("triangleCounts: hand-verified counts, zero-triangle nodes included") {
    // K4 minus edge (1,4), plus pendant node 5:
    //   triangles (1,2,3) and (2,3,4); node 5 closes nothing
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val out = Graph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      1L -> ((2L, 1L)), 2L -> ((3L, 2L)), 3L -> ((3L, 2L)),
      4L -> ((3L, 1L)), 5L -> ((1L, 0L))))
  }

  test("triangleCounts: clique count is exact and each triangle found once") {
    // K6: C(6,3) = 20 triangles, every node in C(5,2) = 10 of them
    val edges = (for {
      i <- 0L until 6L; j <- (i + 1) until 6L
    } yield (i, j)).toDF("a", "b")
    val out = Graph.triangleCounts(edges).collect()
    assert(out.length == 6)
    assert(out.forall(r => r.getLong(1) == 5L && r.getLong(2) == 10L))
  }

  test("triangleCounts: star graph (max skew) has zero triangles") {
    // hub 0 with 40 leaves: naive wedge-from-hub enumeration would emit
    // C(40,2) = 780 wedges from the hub; orientation points every edge
    // AWAY from the leaves (deg 1 < deg 40) so the hub's out-list is
    // empty and nothing closes
    val edges = (1L to 40L).map(l => (0L, l)).toDF("a", "b")
    val out = Graph.triangleCounts(edges).collect()
    assert(out.length == 41)
    assert(out.forall(_.getLong(2) == 0L))
  }

  /** Symmetrize an undirected edge list given as (a, b) pairs. */
  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")

  test("kcorePeel: path graph cascades away entirely under k = 2") {
    // 10-path: endpoints have deg 1, die; their neighbors BECOME
    // endpoints; full cascade needs 5 rounds — the worst case peeling
    // depth, pinning that rounds iterate on RESIDUAL degrees
    val path = (1L to 9L).map(i => (i, i + 1))
    assert(Graph.kcorePeel(sym(path), k = 2, maxRounds = 10).count() == 0)
    // ...and a truncated run reports the partial peel honestly:
    // after 1 round nodes 2..9 remain with the new endpoints at deg 1
    val r1 = Graph.kcorePeel(sym(path), k = 2, maxRounds = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(r1.keySet == (2L to 9L).toSet)
    assert(r1(2L) == ((1L, false)) && r1(9L) == ((1L, false)))
    assert(r1(5L) == ((2L, true)))
  }

  test("kcorePeel: clique plus pendant tail keeps exactly the clique") {
    // K4 (every node deg 3) with tail 4-100-101: k=3 peels the tail in
    // two rounds and stops; the clique survives with degrees intact
    val k4 = for { i <- 0L until 4L; j <- (i + 1) until 4L } yield (i, j)
    val edges = sym(k4 ++ Seq((3L, 100L), (100L, 101L)))
    val out = Graph.kcorePeel(edges, k = 3, maxRounds = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    assert(out.values.forall(_ == ((3L, true))))
  }

  test("kcorePeel: early convergence equals running more rounds") {
    // triangle is its own 2-core: stable after the first no-op round,
    // so maxRounds 1 and 10 must return identical frames
    val tri = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val a = Graph.kcorePeel(tri, k = 2, maxRounds = 1).collect().toSet
    val b = Graph.kcorePeel(tri, k = 2, maxRounds = 10).collect().toSet
    assert(a == b && a.size == 3)
  }

  test("commonNeighborTopK: C4 diagonals score Jaccard 1.0; edges never predicted") {
    // 4-cycle 1-2-3-4-1: the two diagonals (1,3) and (2,4) each share
    // BOTH neighbors (common=2, union=2 -> jaccard 1.0); every adjacent
    // pair must be anti-joined away
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val out = Graph.commonNeighborTopK(c4, minCommon = 2, topK = 3)
      .select($"node", $"candidate", $"common", $"jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 3L, 2L, 1.0), (3L, 1L, 2L, 1.0),
      (2L, 4L, 2L, 1.0), (4L, 2L, 2L, 1.0)))
  }

  test("commonNeighborTopK: topK caps per-node output, rank orders by score then id") {
    // star 0-{1,2,3,4}: every leaf pair shares exactly neighbor 0
    // (common=1, jaccard 1/(1+1-1)=1.0); with minCommon=1, each leaf
    // has 3 candidates -> topK=2 keeps the two lowest ids
    val star = (1L to 4L).map(i => (0L, i)).toDF("a", "b")
    val out = Graph.commonNeighborTopK(star, minCommon = 1, topK = 2)
      .select($"node", $"candidate", $"rank").as[(Long, Long, Int)]
      .collect().groupBy(_._1)
    assert(!out.contains(0L), "hub is adjacent to every leaf — no predictions")
    (1L to 4L).foreach { leaf =>
      val cands = out(leaf).sortBy(_._3).map(_._2).toSeq
      val expect = (1L to 4L).filterNot(_ == leaf).take(2)
      assert(cands == expect, s"leaf $leaf: got $cands want $expect")
    }
  }

  test("pageRankPersonalized: all mass stays near seeds on a disconnected graph") {
    // two disjoint symmetric triangles; seeds only in the first —
    // the second component must hold rank 0 throughout
    def tri(base: Long) = Seq((base, base + 1), (base + 1, base + 2), (base + 2, base))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val edges = (tri(0) ++ tri(10)).toDF("src", "dst")
    val out = Graph.pageRankPersonalized(edges, Seq(0L).toDF("node"), iters = 3)
      .select($"node", $"rank_fp").as[(Long, Long)].collect().toMap
    assert(Seq(10L, 11L, 12L).forall(out(_) == 0L),
      s"unseeded component leaked rank: $out")
    assert(out(0L) > out(1L) && out(1L) == out(2L),
      s"seed must outrank its symmetric neighbors: $out")
  }

  test("pageRankPersonalized with all nodes seeded ~ uniform PageRank") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val allSeeds = Seq(1L, 2L, 3L).toDF("node")
    val ppr = Graph.pageRankPersonalized(edges, allSeeds, iters = 2)
      .select($"node", $"rank_fp").as[(Long, Long)].collect().toMap
    val pr = Graph.pageRankFixedPoint(edges, iters = 2)
      .select($"node", $"rank_fp").as[(Long, Long)].collect().toMap
    assert(ppr == pr, s"uniform seeding must equal plain PageRank: $ppr vs $pr")
  }

  test("pageRankPersonalized drops seeds outside the node domain") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val out = Graph.pageRankPersonalized(edges, Seq(1L, 99L).toDF("node"), 1)
      .select($"node", $"rank_fp").as[(Long, Long)].collect().toMap
    // 99 is not a node: the seed mass must all land on node 1
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) > 0L && out(2L) > 0L)
  }

  private def bfsOut(edges: Seq[(Long, Long)], seeds: Seq[Long],
                     maxHops: Int): Map[Long, Int] =
    Graph.bfsHops(edges.toDF("src", "dst"), seeds.toDF("node"), maxHops)
      .as[(Long, Int)].collect().toMap

  test("bfsHops: chain distances, cycle termination, unreachable absent") {
    // chain 1->2->3->4, cycle 5<->6, isolated-from-seeds 7->8
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (5L, 6L), (6L, 5L), (7L, 8L))
    val out = bfsOut(edges, Seq(1L, 5L), maxHops = 10)
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 0, 6L -> 1),
      s"got $out")
  }

  test("bfsHops: multi-source takes the minimum distance over seeds") {
    // 1->2->3->4 and 4 is also a seed: dist(3)=2 via 1, dist(4)=0
    val out = bfsOut(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq(1L, 4L), 5)
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 0))
  }

  test("bfsHops: maxHops truncates the expansion; maxHops=0 is seeds only") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(bfsOut(chain, Seq(1L), 2) == Map(1L -> 0, 2L -> 1, 3L -> 2))
    assert(bfsOut(chain, Seq(1L), 0) == Map(1L -> 0))
  }

  test("bfsHops: diamond keeps first discovery (shortest path), seeds deduped") {
    // two paths to 4: 1->2->4 (len 2) and 1->3a->3b->4 (len 3)
    val edges = Seq((1L, 2L), (2L, 4L), (1L, 30L), (30L, 31L), (31L, 4L))
    val out = bfsOut(edges, Seq(1L, 1L), 5)
    assert(out(4L) == 2)
    assert(out == Map(1L -> 0, 2L -> 1, 30L -> 1, 4L -> 2, 31L -> 2))
  }

  test("sageMeanStep: neighbor mean equals the hand-computed feature average") {
    import spark.implicits._
    // node 1 receives from {2, 3}; node 2 from {1}
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("src", "dst")
    // recompute the hash features through the same primitive
    def f(node: Long, d: Int): Long =
      Seq(node).toDF("n")
        .select((Sampling.hashValue(
          concat_ws(":", lit("sage"), lit(d.toString), $"n".cast("string")))
          % 2001 - 1000).as("f"))
        .as[Long].head()
    val out = Graph.sageMeanStep(edges, dims = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set((1L, 0), (1L, 1), (2L, 0), (2L, 1)))
    for (d <- 0 to 1) {
      val (n1, self1, mean1) = out((1L, d))
      assert(n1 == 2L && self1 == f(1L, d))
      assert(mean1 == math.rint((f(2L, d) + f(3L, d)).toDouble / 2.0 * 1e6) / 1e6
        || mean1 == (f(2L, d) + f(3L, d)).toDouble / 2.0,
        s"dim $d: mean $mean1 vs avg of ${f(2L, d)} and ${f(3L, d)}")
      val (n2, self2, mean2) = out((2L, d))
      assert(n2 == 1L && self2 == f(2L, d) && mean2 == f(1L, d).toDouble)
    }
  }

  test("degreeAssortativity: star graph is maximally disassortative (-1)") {
    // star: hub 0 connected to leaves 1..5 — hubs link ONLY leaves
    val edges = (1L to 5L).map(l => (0L, l)).toDF("a", "b")
    val r = Graph.degreeAssortativity(edges).collect().head
    assert(r.getLong(0) == 5L)
    assert(r.getDouble(1) == -1.0, s"star must give -1, got ${r.getDouble(1)}")
  }

  test("degreeAssortativity: regular graph has zero variance -> NULL") {
    // 4-cycle: every degree 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val r = Graph.degreeAssortativity(edges).collect().head
    assert(r.getLong(0) == 4L && r.isNullAt(1))
  }

  test("degreeAssortativity matches a hand Pearson on a mixed graph") {
    // path 1-2-3 plus triangle 4-5-6: degrees 1,2,1,2,2,2
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("a", "b")
    val got = Graph.degreeAssortativity(edges).collect().head.getDouble(1)
    // symmetrized pairs (x, y): (1,2)x2,(2,1)x2,(2,2)x6 -> hand Pearson
    val xs = Seq(1, 2, 2, 1, 2, 2, 2, 2, 2, 2).map(_.toDouble)
    val ys = Seq(2, 1, 1, 2, 2, 2, 2, 2, 2, 2).map(_.toDouble)
    val n = xs.size
    val mx = xs.sum / n
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - mx) }.sum
    val vx = xs.map(x => (x - mx) * (x - mx)).sum
    val want = BigDecimal(cov / vx)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == want, s"assortativity $got != hand $want")
  }

  test("labelPropagation: two planted cliques converge to two communities") {
    // cliques {1,2,3,4} and {10,11,12,13} joined by the single bridge 4-10
    def clique(ids: Seq[Long]) =
      for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L))
      ++ Seq((4L, 10L))).toDF("src", "dst")
    val out = Graph.labelPropagation(edges, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // within each clique all labels agree; across cliques they differ
    assert(Seq(1L, 2L, 3L).map(out).distinct.size == 1)
    assert(Seq(11L, 12L, 13L).map(out).distinct.size == 1)
    assert(out(1L) != out(11L), s"cliques merged: $out")
  }

  test("labelPropagation is synchronous and tie-deterministic") {
    // a 4-cycle: every node has two neighbors with distinct labels each
    // round; (count DESC, label ASC) must pick the SMALLER neighbor label
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val r1 = Graph.labelPropagation(edges, rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // neighbors of 1 are {2,4} -> min label 2; of 2 are {1,3} -> 1;
    // of 3 are {2,4} -> 2; of 4 are {1,3} -> 1
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L), s"$r1")
    val again = Graph.labelPropagation(edges, rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again == r1)
  }
}
