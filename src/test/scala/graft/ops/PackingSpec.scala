package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .filter(col("text").isNotNull)
    .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tokens"))

  test("packSequences: every bin fits budget + at most one straddling doc") {
    val budget = 256L
    val packed = Packing.packSequences(docs, $"doc_id", $"n_tokens", budget, shards = 4)
    val bins = packed.groupBy("pack_shard", "pack_bin")
      .agg(sum("n_tokens").as("total"), max("n_tokens").as("biggest"))
    // greedy streaming bound: total < budget + the doc that crossed the line
    assert(bins.filter($"total" >= $"biggest" + budget).count() == 0)
    // no empty corpus accidents: everything is assigned
    assert(packed.filter($"pack_bin".isNull || $"pack_shard".isNull).count() == 0)
    assert(packed.count() == docs.count())
  }

  test("packSequences: bins are contiguous from 0 and deterministic under layout") {
    val packed = Packing.packSequences(docs, $"doc_id", $"n_tokens", 256L, shards = 4)
    val again = Packing.packSequences(docs.repartition(13), $"doc_id", $"n_tokens", 256L, shards = 4)
    assert(packed.exceptAll(again).isEmpty && again.exceptAll(packed).isEmpty)
    val perShard = packed.groupBy("pack_shard")
      .agg(min("pack_bin").as("mn"), countDistinct("pack_bin").as("n"),
        (max("pack_bin") + 1).as("mx1"), max("n_tokens").as("biggest"))
    // first doc of a shard has cumsum-before 0 -> bin 0, always
    assert(perShard.filter($"mn" =!= 0).count() == 0)
    // contiguity is only guaranteed when no doc exceeds the budget (an
    // over-budget doc can straddle 2+ budget multiples and skip a bin id)
    assert(perShard.filter($"biggest" <= 256 && $"n" =!= $"mx1").count() == 0)
    // an over-budget doc can skip bins — but never beyond total/budget
    val bad = packed.groupBy("pack_shard")
      .agg(max("pack_bin").as("mx"), (sum("n_tokens") / 256).as("ub"))
      .filter($"mx" > $"ub")
    assert(bad.count() == 0)
  }

  test("decontaminate drops content matches across different ids, keeps the rest") {
    val train = Seq((1L, "the quick brown fox"), (2L, "unique training text"),
      (3L, "EVAL LEAKED passage")).toDF("id", "text")
    val eval = Seq((100L, "eval leaked passage"), (101L, "held out only")).toDF("id", "text")
    // digest normalizes case/trim -> id 3 must be dropped despite casing
    val out = Dedup.decontaminate(train, col("text"), eval, col("text"))
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 2L))
  }
}
