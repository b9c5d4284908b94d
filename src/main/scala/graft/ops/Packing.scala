package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: group documents into training sequences under a
  * token budget — the batching step between a cleaned corpus and an
  * LLM data loader.
  *
  * Exact bin packing is NP-hard and inherently sequential; the
  * scalable form is greedy STREAMING packing: fix a deterministic
  * document order, take the running token cumsum, and cut a new bin
  * whenever the budget line is crossed. A bin can overshoot the budget
  * by at most one document (standard for streaming packers — the
  * loader truncates or the corpus pre-filters over-long docs).
  *
  * Parallelism: packing is sequential WITHIN a stream, so the corpus
  * is sharded first (`shards` — deterministic by key hash) and each
  * shard packs independently; bin ids are (shard, bin-in-shard). One
  * window shuffle per run, state O(1) per row — the 100 TB shape.
  * Window + cumsum is plain SQL, so the whole op is oracle-checkable.
  */
object Packing {

  /** Adds `out_shard` and `out_bin`: the packed-sequence assignment of
    * each document under `maxTokens`, packing in (tokens desc, key)
    * order within each shard (descending-first keeps big docs from
    * splitting late bins — the FFD-flavored greedy).
    *
    * @param key       stable unique document key (orders ties; shards)
    * @param tokenCol  per-document token count (pre-computed, e.g.
    *                  TextOps.tokenCount); rows with NULL counts are
    *                  the caller's problem — filter first
    */
  def packSequences(df: DataFrame, key: Column, tokenCol: Column,
                    maxTokens: Long, shards: Int,
                    outShard: String = "pack_shard",
                    outBin: String = "pack_bin"): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(shards > 0, "shards must be positive")
    val shard = Sampling.hashBucket(key, shards)
    val w = Window.partitionBy(shard).orderBy(tokenCol.desc, key.asc)
    // bin = budget multiples consumed BEFORE this doc: the doc that
    // crosses the line still belongs to the bin it started filling
    val cumBefore = sum(tokenCol).over(w) - tokenCol
    df.withColumn(outShard, shard)
      .withColumn(outBin, floor(cumBefore / lit(maxTokens.toDouble)).cast("long"))
  }

  /** DuckDB SQL fragment computing exactly the (shard, bin) pair of
    * [[packSequences]] — same hash, same window, same cut rule. */
  def packSequencesSql(keyExpr: String, tokenExpr: String,
                       maxTokens: Long, shards: Int): (String, String) = {
    val shard = Sampling.hashBucketSql(keyExpr, shards)
    val w = s"OVER (PARTITION BY $shard ORDER BY $tokenExpr DESC, $keyExpr ASC)"
    val cumBefore = s"(SUM($tokenExpr) $w - $tokenExpr)"
    (shard,
      s"CAST(FLOOR($cumBefore / CAST($maxTokens AS DOUBLE)) AS BIGINT)")
  }
}
