package graft.ops

import org.apache.spark.sql.DataFrame
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
  def pageRankFixedPoint(edges: DataFrame, iters: Int,
                         damping: Int = 85): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(damping > 0 && damping < 100, s"need 0 < damping < 100, got $damping")
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val n = deg.agg(count(lit(1)).as("n_nodes"))
    // (node, deg, n_nodes): the loop-invariant frame
    val base = deg.crossJoin(broadcast(n))
    val teleport = expr(s"(($RankFp div n_nodes) * ${100 - damping}) div 100")
    var ranks = base.withColumn("r", expr(s"$RankFp div n_nodes"))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(ranks.select(col("node"), col("deg"), col("r")),
          edges("src") === col("node"))
        .select(col("dst").as("node"), expr("r div deg").as("contrib"))
      val sums = contribs.groupBy(col("node"))
        .agg(sum(col("contrib")).as("s"))
      ranks = base.join(sums, Seq("node"), "left")
        .withColumn("r",
          teleport + expr(s"(coalesce(s, 0L) * $damping) div 100"))
        .drop("s")
    }
    ranks.select(col("node"), col("deg"), col("r").as("rank_fp"))
  }
}
