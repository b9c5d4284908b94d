package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list DataFrames — extension tier.
  *
  * Web-scale corpus curation weights pages by link importance before
  * sampling (the original PageRank use case: rank CommonCrawl hosts,
  * keep the head); this is the batch-iterative companion to the
  * connected-components machinery in [[Dedup.clusters]].
  */
object Graph {

  /** Fixed-point scale: ranks live in integer units of 1e-12. */
  val RankFp: Long = 1000000000000L

  /** PageRank in FIXED-POINT integer arithmetic: ranks are BIGINT
    * multiples of 1/[[RankFp]], per-edge contributions are integer
    * divisions `r div deg`, and the damping blend is `(s*85) div 100`.
    * Every operation is order-independent integer math, so the result
    * is bit-exact across engines and partitionings — a SQL engine can
    * replay the whole iteration unrolled (no float-summation drift),
    * which makes an approximate-looking iterative algorithm fully
    * oracle-checkable.
    *
    * `edges` is a DIRECTED (src, dst) list; callers wanting undirected
    * semantics union both directions first. Nodes are the distinct
    * `src` values — a node must have out-degree ≥ 1 (no dangling-mass
    * redistribution pass; symmetrized graphs satisfy this by
    * construction).
    *
    * Scale shape: degrees and the node count are computed once; each
    * iteration is one equi-join of edges to the current ranks (hashed
    * on the SAME node key the previous iteration's aggregate produced,
    * so the exchange is reusable) plus one map-side-combinable sum by
    * dst. The static degree frame re-enters every iteration through an
    * identical shuffle subtree, which Spark collapses to a single
    * ReusedExchange; nothing is collected to the driver and no
    * iteration sees more than |edges| rows.
    */
  def pageRankFixedPoint(edgesIn: DataFrame, iters: Int,
                         damping: Int = 85): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(damping > 0 && damping < 100, s"need 0 < damping < 100, got $damping")
    // Co-partitioned iteration (round 10): the edge list is hash-
    // partitioned on src ONCE and checkpointed — the degree aggregate
    // then runs in-partition and every round's contribution join is
    // exchange-free (each rank frame comes out of its node-keyed
    // aggregate already partitioned on the join key). The one
    // inherent exchange per round is the message shuffle (combinable
    // sum by dst). AQE stays ON: its runtime coalescing of the tiny
    // per-round exchanges measured faster at local[32] than static
    // plans paying 32 tasks per stage (the static form only won at
    // narrow local[4] runs — a measured round-10 negative result).
    // Materializing edges ONCE also keeps the derivation subtree
    // (often a join+distinct itself) from re-executing per round
    // (measured 3.6 s -> 1.4 s at sf0.1 for 3 rounds on the
    // order-supplier graph).
    val edges = edgesIn.repartition(col("src")).localCheckpoint(true)
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val n = deg.agg(count(lit(1)).as("n_nodes"))
    // (node, deg, n_nodes): the loop-invariant frame, consumed by every
    // round's rank rebuild — checkpointed so the degree aggregate runs
    // once, not once per consumer
    val base = deg.crossJoin(broadcast(n)).localCheckpoint(true)
    val teleport = expr(s"(($RankFp div n_nodes) * ${100 - damping}) div 100")
    var ranks = base.withColumn("r", expr(s"$RankFp div n_nodes"))
    for (_ <- 1 to iters) {
      // shuffle_hash: co-partitioned sides -> exchange-free AND
      // sort-free (SMJ would re-sort the static edge list per round)
      val contribs = edges
        .join(ranks.select(col("node"), col("deg"), col("r"))
            .hint("shuffle_hash"),
          edges("src") === col("node"))
        .select(col("dst").as("node"), expr("r div deg").as("contrib"))
      val sums = contribs.groupBy(col("node"))
        .agg(sum(col("contrib")).as("s"))
      ranks = base.join(sums.hint("shuffle_hash"), Seq("node"), "left")
        .withColumn("r",
          teleport + expr(s"(coalesce(s, 0L) * $damping) div 100"))
        .drop("s")
    }
    ranks.select(col("node"), col("deg"), col("r").as("rank_fp"))
  }

  /** Personalized (topic-sensitive) PageRank: the teleport mass lands
    * on a SEED set instead of uniformly — ranks then measure proximity
    * to the seeds (trust propagation from vetted domains, "more like
    * these" corpus expansion), not global importance. Same integer
    * fixed-point arithmetic as [[pageRankFixedPoint]] (bit-exact,
    * unrolled-SQL replayable): r₀ = FP div |seeds| on seeds else 0, and
    * each round r' = (p·(100−d)) div 100 + (Σ contribs · d) div 100
    * with p the personalization vector. Seeds outside the node domain
    * are dropped (inner join); node domain is distinct `src`, so every
    * node has out-degree ≥ 1 (symmetrize first, as with the uniform
    * variant). Scale shape identical to [[pageRankFixedPoint]]: the
    * loop-invariant (node, deg, p) frame re-enters each round through
    * one reusable exchange; per-round work is one equi-join + one
    * combinable sum. */
  def pageRankPersonalized(edgesIn: DataFrame, seedsIn: DataFrame,
                           iters: Int, damping: Int = 85): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(damping > 0 && damping < 100, s"need 0 < damping < 100, got $damping")
    // co-partitioned AQE-planned iteration — see
    // [[pageRankFixedPoint]]'s note
    val edges = edgesIn.repartition(col("src")).localCheckpoint(true)
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val seeds = seedsIn.select(col("node")).distinct()
      .join(deg.select(col("node")), Seq("node"))
      .withColumn("is_seed", lit(1))
    val ns = seeds.agg(count(lit(1)).as("n_seeds"))
    // node-sized loop invariant, consumed by every round's join AND the
    // rank init — materialize ONCE or the seed derivation (often a
    // table scan upstream) re-executes per iteration (measured
    // 112.7 s → 73.0 s at the 100× step for 3 rounds)
    val base = deg
      .join(seeds.select(col("node"), col("is_seed")), Seq("node"), "left")
      .crossJoin(broadcast(ns))
      .withColumn("p", when(col("is_seed") === 1,
        expr(s"$RankFp div n_seeds")).otherwise(lit(0L)))
      .drop("is_seed")
      .localCheckpoint(true)
    var ranks = base.withColumn("r", col("p"))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(ranks.select(col("node"), col("deg"), col("r"))
            .hint("shuffle_hash"),
          edges("src") === col("node"))
        .select(col("dst").as("node"), expr("r div deg").as("contrib"))
      val sums = contribs.groupBy(col("node"))
        .agg(sum(col("contrib")).as("s"))
      ranks = base.join(sums.hint("shuffle_hash"), Seq("node"), "left")
        .withColumn("r",
          expr(s"(p * ${100 - damping}) div 100") +
            expr(s"(coalesce(s, 0L) * $damping) div 100"))
        .drop("s")
    }
    ranks.select(col("node"), col("deg"), col("r").as("rank_fp"))
  }

  /** General PageRank for DIRECTED graphs: node domain is src ∪ dst,
    * sink nodes (out-degree 0) keep their mass in the system via
    * dangling-mass redistribution — each iteration their summed rank is
    * split evenly across all nodes (integer `D div n`, one more
    * order-independent sum, so the unrolled-SQL oracle property of
    * [[pageRankFixedPoint]] is preserved):
    *
    *   r'(v) = ((FP div n) * (100-d)) div 100
    *         + ((Σ_{u→v} r(u) div deg(u)  +  D div n) * d) div 100
    *
    * and stops EARLY when the ranks reach their exact integer fixed
    * point (max |Δr| = 0) — once r_k = r_{k-1}, every further iteration
    * is the identity, so stopping at k returns bit-identical results to
    * running all `maxIters` (which is what an unrolled oracle replays;
    * data-dependent early exit cannot desynchronize them).
    *
    * Scale shape: each iteration `localCheckpoint`s its |nodes|-sized
    * rank frame — materializing it AND truncating lineage, without
    * which the logical plan doubles per round (next references cur
    * twice: contributions + dangling sum) and explodes exponentially —
    * then runs one cheap max-delta aggregate over the checkpointed
    * blocks as the convergence test. The edge list re-enters each
    * iteration's join unchanged; nothing is collected to the driver.
    * (localCheckpoint trades executor-loss resilience for speed, the
    * standard Spark iterative-algorithm posture; superseded rank RDDs
    * are reclaimed by the ContextCleaner once dereferenced.)
    *
    * Returns (ranks, iterationsRun). */
  def pageRankConverged(edgesIn: DataFrame, maxIters: Int,
                        damping: Int = 85): (DataFrame, Int) = {
    require(maxIters >= 1, s"need maxIters >= 1, got $maxIters")
    require(damping > 0 && damping < 100, s"need 0 < damping < 100, got $damping")
    // co-partitioned AQE-planned iteration — see
    // [[pageRankFixedPoint]]'s note. The rank frame is node-keyed and
    // checkpointed per round (partitioning preserved), so the
    // contribution join exchanges nothing beyond what AQE coalesces.
    val edges = edgesIn.repartition(col("src")).localCheckpoint(true)
    val outDeg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("odeg"))
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node"))).distinct()
    val deg = nodes.join(outDeg.hint("shuffle_hash"), Seq("node"), "left")
      .select(col("node"), coalesce(col("odeg"), lit(0L)).as("deg"))
    val n = deg.agg(count(lit(1)).as("n_nodes"))
    val teleport = expr(s"(($RankFp div n_nodes) * ${100 - damping}) div 100")
    var ranks = deg.crossJoin(broadcast(n))
      .withColumn("r", expr(s"$RankFp div n_nodes"))
      .localCheckpoint()
    var used = 0
    var converged = false
    while (used < maxIters && !converged) {
      val cur = ranks
      val contribs = edges
        .join(cur.filter(col("deg") > 0)
            .select(col("node"), col("deg"), col("r")).hint("shuffle_hash"),
          edges("src") === col("node"))
        .select(col("dst").as("node"), expr("r div deg").as("contrib"))
      val sums = contribs.groupBy(col("node")).agg(sum(col("contrib")).as("s"))
      // dangling mass: a 1-row aggregate, broadcast back in (never collected)
      val dang = cur.filter(col("deg") === 0)
        .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
      val next = cur.withColumnRenamed("r", "r_prev")
        .join(sums.hint("shuffle_hash"), Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .withColumn("r", teleport +
          expr(s"((coalesce(s, 0L) + (dang div n_nodes)) * $damping) div 100"))
        .drop("s", "dang")
        .localCheckpoint() // materialize + truncate lineage (see Scaladoc)
      val deltaRow = next.agg(max(abs(col("r") - col("r_prev")))).head()
      val maxDelta = if (deltaRow.isNullAt(0)) 0L else deltaRow.getLong(0)
      used += 1
      converged = maxDelta == 0L
      ranks = next.drop("r_prev")
    }
    (ranks.select(col("node"), col("deg"), col("r").as("rank_fp")), used)
  }

  /** Per-node triangle counts by DEGREE-ORDERED edge orientation — the
    * skew-safe formulation (Suri & Vassilvitskii's MR triangle counting;
    * also the classic compact-forward algorithm): orient every
    * undirected edge from its lower-(degree, id) endpoint to the higher,
    * enumerate wedges only from each node's ORIENTED out-neighborhood,
    * and close them against the oriented edge set. Orientation caps
    * every out-degree at O(√m) regardless of how skewed the raw degree
    * distribution is — a celebrity node with 10⁸ followers contributes
    * wedges from its (small) out-list, not its in-list — so wedge volume
    * is O(m^1.5) worst case and near-linear on real sparse graphs,
    * where the naive per-node neighborhood self-join is quadratic in the
    * hottest degree. Each triangle is found exactly once (its
    * lowest-rank corner is the wedge pivot).
    *
    * `edges`: undirected edge list as canonical `(a, b)` pairs with
    * `a < b`, already distinct. Output: one row per node —
    * (node, deg, n_tri) — including zero-triangle nodes, so the result
    * is a total audit of the graph, not just the triangle corners.
    *
    * Plan shape: one aggregate for degrees, two broadcast-or-shuffle
    * equi-joins to decorate endpoints, one self-equi-join on the wedge
    * pivot, one equi-join to close, one final aggregate. Nothing is
    * collected; no CartesianProduct anywhere. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("node"))
      .unionByName(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // decorate both endpoints with their degree, then orient by
    // (deg, id) rank — a total order, so orientation is deterministic
    val dec = edges
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    val aLower = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val o = dec.select(
      when(aLower, col("a")).otherwise(col("b")).as("src"),
      when(aLower, col("b")).otherwise(col("a")).as("dst"),
      when(aLower, struct(col("db").as("rd"), col("b").as("rid")))
        .otherwise(struct(col("da").as("rd"), col("a").as("rid"))).as("rdst"))
    // wedges: ordered pairs of out-neighbors of one pivot; rank order
    // on the pair means the closing edge, if present, is oriented v→w
    val wedges = o.select(col("src"), col("dst").as("v"), col("rdst").as("rv"))
      .join(o.select(col("src"), col("dst").as("w"), col("rdst").as("rw")),
        Seq("src"))
      .filter(col("rv") < col("rw"))
      .select(col("src").as("u"), col("v"), col("w"))
    val tri = wedges.join(
      o.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
    val corners = tri.select(col("u").as("node"))
      .unionByName(tri.select(col("v").as("node")))
      .unionByName(tri.select(col("w").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.join(corners, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** Link prediction by common-neighbor Jaccard — for every
    * NON-adjacent node pair sharing at least `minCommon` neighbors,
    * score |N(a)∩N(b)| / |N(a)∪N(b)| (Liben-Nowell & Kleinberg's
    * neighborhood-overlap predictor). Candidate pairs come from the
    * wedge join (adjacency self-joined on the shared neighbor) — the
    * same Σdeg² work bound as triangle counting, NEVER all-pairs — and
    * existing edges are removed with one anti-join. Per-node output is
    * capped at the `topK` best predictions (score desc, partner asc;
    * the score is a rounded ratio of exact integer counts, so ranking
    * is engine-stable), keeping the result node-bounded however dense
    * the wedge space is.
    *
    * `edges`: undirected edge list as canonical `(a, b)`, `a < b`,
    * distinct. Output: (node, candidate, common, jaccard, rank). */
  def commonNeighborTopK(edges: DataFrame, minCommon: Int, topK: Int): DataFrame = {
    require(minCommon >= 1 && topK >= 1, "minCommon and topK must be >= 1")
    val adj = edges.select(col("a").as("node"), col("b").as("nbr"))
      .unionByName(edges.select(col("b").as("node"), col("a").as("nbr")))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val common = adj.select(col("nbr").as("via"), col("node").as("x"))
      .join(adj.select(col("nbr").as("via"), col("node").as("y")), Seq("via"))
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    val candidates = common.join(edges,
      common("x") === edges("a") && common("y") === edges("b"), "left_anti")
    val scored = candidates
      .join(deg.select(col("node").as("x"), col("deg").as("dx")), Seq("x"))
      .join(deg.select(col("node").as("y"), col("deg").as("dy")), Seq("y"))
      .withColumn("jaccard", round(col("common").cast("double") /
        (col("dx") + col("dy") - col("common")).cast("double"), 6))
    // symmetric expansion so each node ranks ALL its candidates, then
    // per-node top-k as a WindowGroupLimit-able rank
    val sym = scored.select(col("x").as("node"), col("y").as("candidate"),
        col("common"), col("jaccard"))
      .unionByName(scored.select(col("y").as("node"), col("x").as("candidate"),
        col("common"), col("jaccard")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("node")).orderBy(col("jaccard").desc, col("candidate"))
    sym.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= topK)
  }

  /** k-core decomposition by iterative peeling — the dense-cluster
    * extractor corpus curation uses to find link farms / spam rings
    * (and, symmetrically, high-trust cores) before weighting a crawl:
    * repeatedly delete every node of degree < k until the residual
    * graph is stable; what's left is the k-core.
    *
    * `edgesIn` is an undirected graph given as a SYMMETRIC (src, dst)
    * list (both directions present), so `COUNT(*) GROUP BY src` is the
    * full degree.
    *
    * The edge list is materialized ONCE and stays STATIC; per-node
    * degrees are maintained INCREMENTALLY — each round joins the edge
    * list against only the NEWLY-dead node set (usually tiny →
    * broadcast, so the dominant frame is scanned but never reshuffled)
    * and decrements the survivors' degrees by their edges into it.
    * This is the delta formulation of peeling: every edge is processed
    * at most twice across ALL rounds (once per endpoint death), where
    * the naive recount-and-filter form reshuffles and rewrites the full
    * edge list three times per round — measured 2.97 s → timeout(>10 m)
    * vs 2.97 s → linear at the 100× step (117 M symmetric edges). Only
    * the node-sized degree frame is `localCheckpoint`ed per round
    * (lineage truncation, [[pageRankConverged]] posture); the
    * convergence probe is the dead-set count the round needs anyway.
    *
    * Peeling is monotone (the alive set only shrinks), so a round with
    * an empty dead set is the identity and a data-dependent early exit
    * at round j < maxRounds returns bit-identical results to running
    * all maxRounds — which is exactly what the unrolled-SQL oracle
    * replays, the same early-stop / fixed-unroll equivalence
    * [[pageRankConverged]] relies on.
    *
    * Returns one row per ALIVE node after peeling: (node, deg, in_core)
    * with deg on the residual graph and `in_core = deg >= k` (all TRUE
    * iff converged within maxRounds — surfacing the flag rather than
    * filtering on it keeps a truncated run auditable instead of
    * silently wrong). */
  /** Multi-source BFS: minimum hop distance from any seed node, the
    * frontier-expansion primitive under reachability audits (how much
    * of the corpus graph is within k links of a trusted seed set),
    * crawl-depth budgeting, and influence radii.
    *
    * Delta iteration, the Pregel/Flink formulation: each round joins
    * the STATIC edge list against only the current FRONTIER (the nodes
    * first discovered last round), anti-joins the visited set to keep
    * first discoveries only, and unions them in at `dist = round`.
    * Per-round edge work is bounded by the frontier's incident edges —
    * never the whole graph — and total work across all rounds is
    * O(edges reached), the same every-edge-once bound as
    * [[kcorePeel]]'s peeling. Node-sized frames (`visited`, frontier)
    * are `localCheckpoint`ed per round to keep lineage flat
    * ([[pageRankConverged]] posture); the only driver-side action is
    * the empty-frontier probe, a bounded existence check.
    *
    * BFS discovers each node at its minimum distance (level-order
    * expansion), so the result equals `MIN(dist)` over all bounded
    * walks — which is exactly what a recursive-CTE oracle replays; an
    * early exit on an empty frontier is the identity, the same
    * early-stop / fixed-bound equivalence the other iterative
    * operators rely on.
    *
    * `edgesIn`: DIRECTED (src, dst); symmetrize for undirected graphs.
    * `sources`: seed nodes as a `node` column (dist 0; deduped here).
    * Returns (node, dist) for every node within `maxHops`; unreachable
    * nodes are absent, matching the walk semantics. */
  def bfsHops(edgesIn: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"need maxHops >= 0, got $maxHops")
    val edges = edgesIn.select(col("src"), col("dst")).localCheckpoint(true)
    var visited = sources.select(col("node")).distinct()
      .withColumn("dist", lit(0)).localCheckpoint(true)
    var frontier = visited.select(col("node"))
    var hop = 1
    while (hop <= maxHops && !frontier.isEmpty) {
      val next = frontier.join(edges, frontier("node") === edges("src"))
        .select(edges("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint(true)
      visited = visited
        .unionByName(next.withColumn("dist", lit(hop)))
        .localCheckpoint(true)
      frontier = next
      hop += 1
    }
    visited
  }

  def kcorePeel(edgesIn: DataFrame, k: Int, maxRounds: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(maxRounds >= 1, s"need maxRounds >= 1, got $maxRounds")
    val edges = edgesIn.localCheckpoint(true)
    var alive = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    var round = 0
    var stable = false
    while (round < maxRounds && !stable) {
      val dead = alive.filter(col("deg") < k).select(col("node").as("dnode"))
      if (dead.isEmpty) stable = true
      else {
        // degree deltas: edges whose dst just died, counted per src —
        // the ONLY per-round edge work, and its output is bounded by
        // the edges incident to this round's dead set
        val dec = edges.join(dead, edges("dst") === col("dnode"))
          .groupBy(col("src").as("node")).agg(count(lit(1)).as("c"))
        alive = alive.filter(col("deg") >= k)
          .join(dec, Seq("node"), "left")
          .select(col("node"),
            (col("deg") - coalesce(col("c"), lit(0L))).as("deg"))
          .localCheckpoint(true)
      }
      round += 1
    }
    alive.withColumn("in_core", col("deg") >= k)
  }

  /** HITS hubs-and-authorities (Kleinberg 1999) as an integer
    * fixed-point iteration — the OTHER classic link-analysis score:
    * where PageRank measures global importance, HITS separates
    * POINTERS-TO-GOOD-THINGS (hubs) from POINTED-AT-BY-GOOD-POINTERS
    * (authorities) by mutual recursion h = E·a, a = Eᵀ·h. On a
    * bipartite trade graph the split is the natural reading: customer
    * hub weight = breadth of strong suppliers bought from, supplier
    * authority = endorsement by strong buyers.
    *
    * Replayability discipline = [[pageRankFixedPoint]] +
    * [[Similarity.gramTopDirection]]'s max-norm: scores live as micro
    * longs, each half-round is one equi-join + one combinable integer
    * SUM, and renormalization divides by the round's MAX (a 1-row
    * broadcast) before micro re-quantization — a fixed point both
    * engines agree on bit-for-bit, unrollable in SQL. Per round: two
    * joins, two aggregates, two 1-row maxes; every frame
    * localCheckpointed (multi-consumer + iteration lineage rules).
    * Output: (node, role 'hub'|'authority', score_micro). */
  def hitsFixedPoint(edgesIn: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"need 1 <= rounds <= 8, got $rounds")
    // Measured negative result (round 10): HITS alternates join keys
    // (hub pull on dst, authority pull on src), so the co-partition
    // discipline needs the edge list materialized TWICE — and the two
    // eager corpus-sized repartition+checkpoints cost MORE at local[32]
    // than the per-round exchange they save (4.9 s -> 8.6 s isolated,
    // controls flat). The single-copy AQE-planned form below stays.
    val edges = edgesIn.localCheckpoint(true)
    var auth = edges.select(col("dst").as("node")).distinct()
      .withColumn("a", lit(1000000L))
      .localCheckpoint(true)
    var hub: DataFrame = null
    for (_ <- 1 to rounds) {
      val hraw = edges.join(auth, auth("node") === edges("dst"))
        .groupBy(edges("src").as("hnode")).agg(sum(col("a")).as("hr"))
      val hmax = hraw.agg(max(col("hr")).as("hm"))
      hub = hraw.crossJoin(broadcast(hmax))
        .select(col("hnode").as("node"),
          round(col("hr").cast("double") / col("hm").cast("double") * lit(1e6))
            .cast("long").as("h"))
        .localCheckpoint(true)
      val araw = edges.join(hub, hub("node") === edges("src"))
        .groupBy(edges("dst").as("anode")).agg(sum(col("h")).as("ar"))
      val amax = araw.agg(max(col("ar")).as("am"))
      auth = araw.crossJoin(broadcast(amax))
        .select(col("anode").as("node"),
          round(col("ar").cast("double") / col("am").cast("double") * lit(1e6))
            .cast("long").as("a"))
        .localCheckpoint(true)
    }
    hub.select(col("node"), lit("hub").as("role"), col("h").as("score_micro"))
      .unionByName(auth.select(col("node"), lit("authority").as("role"),
        col("a").as("score_micro")))
  }

  /** Degree assortativity (Newman 2002) — ONE number summarizing a
    * graph's mixing pattern: the Pearson correlation of endpoint
    * degrees over all (symmetrized) edges. Positive = hubs link hubs
    * (social-graph shape); negative = hubs link leaves (bipartite-ish,
    * hub-and-spoke). The pre-flight statistic that tells a pipeline
    * whether degree-based partitioning/salting will face correlated
    * hotspots.
    *
    * Sufficient-statistics shape (the OLS/t-test discipline): exact
    * integer Σx, Σxx, Σxy over the 2m directed endpoint pairs — one
    * degree aggregate, two decorate joins, one 1-row reduce; the final
    * correlation is +,−,×,÷,√ on exact longs, IEEE-deterministic
    * cross-engine. Symmetry makes Σx = Σy exactly, so only three sums
    * are carried. Returns one row: (m_edges, assortativity). */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("node"))
      .unionByName(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val dec = edges
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    // symmetrize: each undirected edge contributes (da,db) and (db,da)
    val pairs = dec.select(col("da").as("x"), col("db").as("y"))
      .unionByName(dec.select(col("db").as("x"), col("da").as("y")))
    pairs.agg(count(lit(1)).as("m2"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select((col("m2") / 2).cast("long").as("m_edges"),
        when(col("m2") * col("sxx") - col("sx") * col("sx") > 0, round(
          (col("m2") * col("sxy") - col("sx") * col("sx")).cast("double")
            / (col("m2") * col("sxx") - col("sx") * col("sx")).cast("double"),
          6)).as("assortativity"))
  }

  /** One GraphSAGE MEAN-aggregator round (Hamilton et al. 2017) — the
    * message-passing step GNN feature pipelines run over a relational
    * graph before any model sees it: each node's layer-1 representation
    * is its own feature vector concatenated with the MEAN of its
    * neighbors' vectors. Output is long-form, one row per (node, dim):
    * (node, d, n_neighbors, self_milli, neigh_mean_milli).
    *
    * Node features are hash-derived milli-quantized values (the
    * deterministic stand-in for an upstream embedding table — a real
    * one drops in as a join), computed IN-ROW from the neighbor id on
    * each (edge, dim) message — so the aggregation needs NO feature
    * join at all: one explode (edges × dims) and one combinable
    * groupBy(node, dim) whose sums are exact integers. The mean's
    * double division is integer-derived (engine-bit-stable). Scale
    * shape: shuffle O(edges · dims) combinable rows, output O(nodes ·
    * dims); a hot node is just a big combinable group, not a window
    * partition. `edges` is directed (src ← messages from dst);
    * symmetrize for undirected semantics. */
  def sageMeanStep(edges: DataFrame, dims: Int = 4): DataFrame = {
    require(dims >= 1 && dims <= 16, s"need 1 <= dims <= 16, got $dims")
    def feat(node: Column, dIdx: Column): Column =
      Sampling.hashValue(concat_ws(":", lit("sage"), dIdx.cast("string"),
        node.cast("string"))) % 2001 - 1000
    val js = explode(sequence(lit(0), lit(dims - 1)))
    edges.select(col("src"), js.as("d"), col("dst"))
      .withColumn("f", feat(col("dst"), col("d")))
      .groupBy(col("src"), col("d"))
      .agg(count(lit(1)).as("n_neighbors"), sum(col("f")).as("s"))
      .select(col("src").as("node"), col("d"), col("n_neighbors"),
        feat(col("src"), col("d")).as("self_milli"),
        round(col("s").cast("double") / col("n_neighbors").cast("double"), 6)
          .as("neigh_mean_milli"))
  }

  /** Synchronous label propagation — community detection by modal
    * neighbor label (Raghavan et al. 2007), made deterministic (and
    * therefore oracle-replayable) by the total tie order
    * (count DESC, label ASC). Each node starts as its own label; each
    * round every node adopts the most frequent label among its
    * neighbors, all updates reading the PREVIOUS round (synchronous —
    * the asynchronous variant is order-dependent and untestable).
    *
    * Per round: one CO-PARTITIONED equi-join of the symmetrized edge
    * list to the current labels (the edge list is hash-partitioned on
    * src ONCE before the loop; each round's label frame comes out of
    * its final aggregate hash-partitioned on node — so the join itself
    * plans ZERO exchange, round after round: the classic
    * partition-reuse discipline of distributed graph engines), one
    * combinable (node, label) count (map-side combine collapses hot
    * labels before the message shuffle — the one inherent exchange per
    * round), and the modal label as ONE combinable `max(struct(c,
    * −label))` aggregate — selection identical to ROW_NUMBER ordered
    * (c DESC, label ASC), without the window's sort. AQE stays ON
    * (its coalescing of the tiny per-round exchanges measured faster
    * at local[32] than static 32-task stages — round-10 A/B). Labels
    * are localCheckpointed per round (lineage stays flat; the
    * iterative-loop rule). `edges` is directed input; symmetrized
    * internally, so communities are over the undirected structure.
    * Returns (node, label) after `rounds` rounds. */
  def labelPropagation(edgesIn: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"need 1 <= rounds <= 16 (each round is unrolled in plans/oracles), got $rounds")
    val sym = edgesIn.select(col("src"), col("dst"))
      .unionByName(edgesIn.select(col("dst").as("src"), col("src").as("dst")))
      // repartition BEFORE distinct: HashPartitioning(src) satisfies the
      // (src, dst) clustered distribution, so the dedup runs in-partition
      // and the edge list comes out co-partitioned for every round's
      // join in the SAME single exchange
      .repartition(col("src"))
      .distinct()
      .localCheckpoint(true) // consumed once per round
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true) // partitioned by node (src's partitioning)
    for (_ <- 1 to rounds) {
      val counted = sym
        // shuffle_hash: both sides are already partitioned on the key,
        // so the hinted hash join runs exchange-free AND sort-free
        // (SMJ would re-sort the static edge list every round)
        .join(labels.hint("shuffle_hash"), sym("src") === labels("node"))
        .select(sym("dst").as("node"), col("label"))
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("c"))
      labels = counted
        .groupBy(col("node"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
        .localCheckpoint()
    }
    labels
  }
}
