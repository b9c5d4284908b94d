package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine with deterministic ties") {
    val out = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, k = 3)
      .orderBy("rank")
      .select("neighbor_id", "cosine", "rank")
      .as[(Long, Double, Int)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out(0)._2 > 0.99)
    assert(out(1)._2 == 0.0)
    assert(out(2)._2 == -1.0)
  }

  test("lshTopK: identical-direction vectors share a bucket; neighbors found") {
    val out = Similarity.lshTopK(vecs.filter($"vec_id" === 0), vecs, k = 3,
      planes = 4, seed = 7L)
    val ids = out.select("neighbor_id").as[Long].collect().toSet
    assert(ids.contains(1L)) // near-identical vector must share the bucket
    assert(!ids.contains(0L)) // no self-match
  }

  test("cosinePairs: LSH-bucketed variant recalls a healthy share of exact pairs") {
    val emb = Tables.embeddings(spark, sf001).filter($"vec_id" < 200)
    val exact = Similarity.cosinePairs(emb, minCosine = 0.25, tables = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosinePairs(emb, minCosine = 0.25)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))               // LSH never fabricates pairs
    assert(exact.isEmpty || (lsh.size.toDouble / exact.size) >= 0.2,
      s"recall collapsed: ${lsh.size}/${exact.size}")
  }

  test("ivfTopK with nprobe >= nlist is exactly brute force (sf0.001 embeddings)") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" < 10)
    val cents = emb.filter($"vec_id" % 31 === 0) // ~16 cells
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
    val ivfAll = Similarity.ivfTopK(q, emb, k = 5, centroids = cents, nprobe = 1000)
    assert(ivfAll.columns.toSeq == exact.columns.toSeq)
    assert(ivfAll.exceptAll(exact).isEmpty && exact.exceptAll(ivfAll).isEmpty)
  }

  test("ivfTopK recall at nprobe < nlist is above the random-probe floor") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" < 20)
    val cents = emb.filter($"vec_id" % 31 === 0) // ~16 cells
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, emb, k = 5, centroids = cents, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.25, f"IVF recall $recall%.2f at/below the 4/16 random floor")
    assert(ivf.forall { case (a, b) => a != b }) // no self-matches
  }

  test("lshTopK recall vs brute force on real sf0.001 embeddings") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(q, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.2, f"LSH recall $recall%.2f collapsed — bucketing broken")
    // and LSH candidates must all be genuine corpus ids (no fabrication)
    assert(approx.forall { case (a, b) => a != b })
  }
}
