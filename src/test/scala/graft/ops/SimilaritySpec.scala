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
    // dim must match the data: before lshBucket's dim guard existed,
    // omitting it here silently collapsed ALL vectors into bucket 0
    // (null-padded fold) — the test passed for the wrong reason
    val out = Similarity.lshTopK(vecs.filter($"vec_id" === 0), vecs, k = 3,
      planes = 4, seed = 7L, dim = 3)
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

  test("zero-norm vectors are excluded, never NaN-ranked as top neighbors") {
    val dim = 64
    val mk = (id: Long, v: Float) => (id, Seq.fill(dim)(v))
    val corpus = Seq(mk(0L, 0.0f), mk(1L, 1.0f), mk(2L, 2.0f), mk(3L, 3.0f))
      .toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(corpus.filter($"vec_id" === 1), corpus, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!out.contains(0L), "zero vector surfaced as a neighbor")
    assert(out == Set(2L, 3L))
    // zero-norm QUERY rows vanish rather than emitting NaN rows
    val qOut = Similarity.bruteForceTopK(corpus.filter($"vec_id" === 0), corpus, k = 3)
    assert(qOut.isEmpty)
  }

  test("lshBucket fails loudly on an embedding whose dim mismatches the planes") {
    val bad = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "v") // dim 2, planes dim 64
    val planes = Similarity.hyperplanes(4, 64)
    val ex = intercept[Exception] {
      bad.select(Similarity.lshBucket($"v", planes)).collect()
    }
    assert(ex.getMessage.contains("expected embedding dim 64"),
      s"wrong error: ${ex.getMessage}")
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

  test("kmeansFit recovers planted clusters exactly") {
    // three tight clusters far apart; any sane Lloyd run must separate
    // them perfectly within 3 iterations from any 3 distinct seeds
    val pts = (0 until 30).map { i =>
      val center = i % 3 * 100.0
      (i.toLong, Seq(center + (i / 3) * 0.1, center - (i / 3) * 0.1))
    }
    val df = pts.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansFit(df, "vec_id", "embedding", k = 3, iters = 3,
      init = "farthest")
    val assigned = Similarity.kmeansAssign(df, cents, "vec_id", "embedding")
    // each planted cluster maps to exactly one fitted cell
    val purity = assigned
      .withColumn("planted", $"vec_id" % 3)
      .groupBy($"planted").agg(countDistinct($"cid").as("cells"))
      .select("cells").as[Long].collect()
    assert(purity.forall(_ == 1L), s"clusters split across cells: ${purity.toSeq}")
    assert(cents.count() == 3)
    assert(cents.select(sum($"n_members")).as[Long].head() == 30L)
  }

  test("farthest init past the checkpoint threshold: k=12 seeds are 12 distinct points") {
    // 12 well-separated points on a line; greedy farthest-point with
    // k = n must select every point exactly once, and the k > 8 path
    // crosses the periodic localCheckpoint lineage truncation
    val pts = (0 until 12).map(i => (i.toLong, Seq(i * 1000.0, 0.0)))
    val df = pts.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansFit(df, "vec_id", "embedding", k = 12, iters = 0,
      init = "farthest")
    assert(cents.select("cid").as[Long].collect().toSet == (0L until 12L).toSet)
  }

  test("ivfTopK composes with kmeansFit: trained cells match or beat sampled cells") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(cents: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.ivfTopK(q, emb, k = 5,
        centroids = cents, nprobe = 3)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val sampled = emb.filter($"vec_id" % 37 === 0).orderBy($"vec_id").limit(12)
    val trained = Similarity.kmeansFit(emb, "vec_id", "embedding", k = 12, iters = 3)
      .select($"cid".as("vec_id"), $"cvec".as("embedding"))
    val (rs, rt) = (recall(sampled), recall(trained))
    assert(rt >= rs - 0.05, f"trained centroids regressed recall: $rt%.2f vs $rs%.2f")
  }

  test("semanticDedup: planted clusters — reps, flags, tie and zero-norm rules") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),    // cluster 100 rep (d2 = 0)
      (2L, Array(0.99f, 0.14f)),  // near rep 1 -> is_dup
      (4L, Array(0.0f, 1.0f)),    // cluster 200 rep
      (5L, Array(0.1f, 0.995f)),  // near rep 4 -> is_dup
      (6L, Array(0.7f, 0.7f)),    // equidistant -> tie to cid 100; cos ~ .707
      (7L, Array(0.0f, 0.0f))     // zero-norm: dropped from output
    ).toDF("vec_id", "embedding")
    val cents = Seq(
      (100L, Array(1.0f, 0.0f)), (200L, Array(0.0f, 1.0f))
    ).toDF("cid", "cvec")
    val out = Similarity.semanticDedup(corpus, cents, minCosine = 0.95)
      .select($"vec_id", $"cid", $"rep_id", $"is_dup")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (2L, 100L, 1L, true),
      (6L, 100L, 1L, false),
      (5L, 200L, 4L, true)))
  }

  test("kmeansFit: within-cluster variance descends monotonically (real embeddings)") {
    val emb = Tables.embeddings(spark, sf001)
    def wcss(iters: Int): Double = {
      val cents = Similarity.kmeansFit(emb, "vec_id", "embedding", k = 8, iters = iters)
      Similarity.kmeansAssign(emb, cents, "vec_id", "embedding")
        .agg(sum($"d2")).as[Double].head()
    }
    val costs = Seq(wcss(0), wcss(1), wcss(3))
    assert(costs.sliding(2).forall { case Seq(a, b) => b <= a + 1e-6 },
      s"WCSS not monotone: $costs")
  }

  test("randomProject: one-hot input reads out one ±1e6 sign per output dim") {
    // projecting the basis vector e_i yields exactly column i of the
    // sign matrix scaled to micros — pins the matrix wiring (dim order,
    // sign derivation) without re-deriving md5 in the test
    val oneHot = Array.tabulate(64)(i => if (i == 7) 1.0f else 0.0f)
    val df = Seq((1L, oneHot)).toDF("vec_id", "embedding")
    val out = Similarity.randomProject(df, inDim = 64, outDim = 16)
      .select($"out_dim", $"proj_micro").as[(Int, Long)].collect().toMap
    assert(out.keySet == (0 until 16).toSet)
    assert(out.values.forall(v => v == 1000000L || v == -1000000L),
      s"expected ±1e6 sign readout, got ${out.values.take(4)}")
  }

  test("randomProject: exactly linear in micro space on micro-exact inputs") {
    // 0.25-multiples are exact binary floats whose *1e6 scaling is an
    // exact integer, so round() commutes with doubling and the
    // projection must be exactly homogeneous
    val v = Array.tabulate(64)(i => ((i % 5) - 2) * 0.25f)
    val v2 = v.map(_ * 2.0f)
    val df = Seq((1L, v), (2L, v2)).toDF("vec_id", "embedding")
    val rows = Similarity.randomProject(df, 64, 16)
      .select($"vec_id", $"out_dim", $"proj_micro").as[(Long, Int, Long)]
      .collect().groupBy(_._1).map { case (k, a) =>
        k -> a.map(t => t._2 -> t._3).toMap }
    (0 until 16).foreach { j =>
      assert(rows(2L)(j) == 2L * rows(1L)(j), s"dim $j not homogeneous")
    }
  }

  test("randomProject: JL distance preservation within loose bounds (real embeddings)") {
    val emb = Tables.embeddings(spark, sf001).filter($"vec_id" < 40)
    val proj = Similarity.randomProject(emb, 64, 16)
      .groupBy($"vec_id")
      .agg(transform(array_sort(collect_list(struct($"out_dim", $"proj_micro"))),
        e => e.getField("proj_micro").cast("double") / 1e6).as("pv"))
    val orig = emb.select($"vec_id",
      transform($"embedding", x => x.cast("double")).as("ov"))
    val both = proj.join(orig, "vec_id").collect().map { r =>
      r.getLong(0) -> (r.getSeq[Double](1).toArray, r.getSeq[Double](2).toArray)
    }.toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // E[||Px||^2] = k*||x||^2 for Rademacher projections: the per-pair
    // ratio ||Pa-Pb||^2 / (k*||a-b||^2) concentrates near 1; with k=16
    // individual pairs wander, so bound the MEAN ratio loosely
    val ids = both.keys.toSeq.sorted
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.size
      (pa, oa) = both(ids(i)); (pb, ob) = both(ids(j))
      od = d2(oa, ob) if od > 1e-9
    } yield d2(pa, pb) / (16.0 * od)
    val mean = ratios.sum / ratios.size
    assert(mean > 0.5 && mean < 2.0, s"JL mean ratio off: $mean over ${ratios.size} pairs")
  }

  test("pqTopK: planted clusters — ADC retrieves same-cluster neighbors first") {
    // 4 tight clusters far apart; with 16 codebook sources the ADC
    // ranking must place same-cluster points above other clusters
    val pts = (0 until 32).map { i =>
      val c = i % 4
      val base = Array.tabulate(64)(d => if (d % 4 == c) 50.0f else 0.0f)
      base(i / 4 % 64) += (i % 7) * 0.01f
      (i.toLong, base.toSeq)
    }
    val df = pts.toDF("vec_id", "embedding")
    val out = Similarity.pqTopK(df.filter($"vec_id" < 4), df, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (q, n) =>
      assert(q % 4 == n % 4, s"query $q got cross-cluster neighbor $n") }
  }

  test("pqTopK recall vs brute force on real sf0.001 embeddings") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.pqTopK(q, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // ADC with an untrained 16-entry codebook is coarse; require it to
    // beat the random-retrieval floor (5/500 per query = 1%) clearly
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.1, f"PQ recall $recall%.2f at the random floor — ADC broken")
    assert(approx.forall { case (a, b) => a != b })
  }

  test("pqTopK: exactly k ranked rows per query, ranks contiguous from 1") {
    val emb = Tables.embeddings(spark, sf001)
    val out = Similarity.pqTopK(emb.filter($"vec_id" < 5), emb, k = 3)
      .select("query_id", "rank").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(out.size == 5)
    out.values.foreach(rs => assert(rs == Seq(1, 2, 3)))
  }

  test("pqTopK validates dimension split") {
    val df = Seq((1L, Seq.fill(10)(1.0f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.pqTopK(df, df, k = 1, m = 8, dim = 10)
    }
    assert(ex.getMessage.contains("subspaces"))
  }

  test("gramTopDirection: rank-1 corpus recovers the basis axis in one round") {
    // every vector is a multiple of e_5 -> G = c * e5 e5^T; from the
    // all-ones start one round lands exactly on e_5 (max-norm 1e6)
    val pts = (1 to 8).map(s =>
      (s.toLong, Seq.tabulate(16)(d => if (d == 5) s * 1.0f else 0.0f)))
    val out = Similarity.gramTopDirection(
        pts.toDF("vec_id", "embedding"), dim = 16, rounds = 1)
      .as[(Int, Long)].collect().toMap
    assert(out(5) == 1000000L)
    (0 until 16).filterNot(_ == 5).foreach(d => assert(out(d) == 0L, s"dim $d"))
  }

  test("gramTopDirection: dominant variance axis wins on anisotropic data") {
    // axis 2 has 100x the spread of every other axis
    val pts = (0 until 40).map { i =>
      val v = Array.tabulate(8)(d => (((i * 7 + d) % 5) - 2) * 0.01f)
      v(2) = (((i * 3) % 5) - 2) * 1.0f
      (i.toLong, v.toSeq)
    }
    val out = Similarity.gramTopDirection(
        pts.toDF("vec_id", "embedding"), dim = 8, rounds = 5)
      .as[(Int, Long)].collect().toMap
    val top = out.maxBy { case (_, w) => math.abs(w) }._1
    assert(top == 2, s"dominant axis $top, weights $out")
    assert(math.abs(out(2)) == 1000000L, "max-norm must pin the top weight")
  }

  test("gramTopDirection is partitioning-independent (real embeddings)") {
    val emb = Tables.embeddings(spark, sf001)
    val a = Similarity.gramTopDirection(emb, 64, 2)
      .as[(Int, Long)].collect().toMap
    val b = Similarity.gramTopDirection(emb.repartition(13), 64, 2)
      .as[(Int, Long)].collect().toMap
    assert(a == b, "direction must not depend on input partitioning")
  }

  test("pqTopKSubspace: codebooks genuinely differ per subspace") {
    // the shared pick slices the SAME 16 vectors for every subspace;
    // the per-subspace pick must select different source sets, so at
    // least one query's ADC ranking should diverge from pqTopK's
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" < 20)
    val shared = Similarity.pqTopK(q, emb, k = 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    val per = Similarity.pqTopKSubspace(q, emb, k = 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(per != shared, "per-subspace pick collapsed to the shared pick")
  }

  test("pqTopKSubspace recall vs brute force on real sf0.001 embeddings") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.pqTopKSubspace(q, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.1, f"subspace-PQ recall $recall%.2f at the random floor")
    val perQuery = approx.groupBy(_._1)
    assert(perQuery.size == 20 && perQuery.values.forall(_.size == 5))
  }

  test("ivfPqTopK: k ranked rows per query when nprobe covers enough corpus") {
    val emb = Tables.embeddings(spark, sf001)
    val out = Similarity.ivfPqTopK(emb.filter($"vec_id" < 10), emb, k = 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.size).toSeq,
        "ranks contiguous from 1")
      assert(rs.size <= 5)
    }
    out.foreach { case (q, _, n) => assert(q != n) }
  }

  test("ivfPqTopK with nprobe = nlist recalls at least as much as nprobe = 1") {
    // probing every cell removes the IVF routing loss; the PQ residual
    // distortion is identical in both runs, so recall vs brute force
    // can only improve with more probes
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(nprobe: Int): Double = {
      val approx = Similarity.ivfPqTopK(q, emb, k = 5, nprobe = nprobe)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (exact & approx).size.toDouble / exact.size
    }
    val r1 = recall(1)
    val rAll = recall(8)
    assert(rAll >= r1, f"full-probe recall $rAll%.2f < nprobe-1 recall $r1%.2f")
    // brute force ranks by cosine, IVF-PQ by squared-L2 over coarse
    // residual codes — on these unnormalized random embeddings ~9%
    // against a 1% random floor is the honest expectation; require 5x
    // above random, not a tuned-index recall
    assert(rAll >= 0.05, f"IVF-PQ full-probe recall $rAll%.2f at the random floor")
  }

  test("ivfPqTopK: every returned neighbor lies in one of the query's probed cells") {
    // the structural IVF property: candidates come only from probed
    // cells — reconstruct assignment + probes independently and check
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" < 10)
    val out = Similarity.ivfPqTopK(q, emb, k = 5, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    // independent reconstruction of the coarse structure via a second
    // run with the same deterministic picks but k covering everything:
    // a neighbor outside probed cells can never appear, so the pair
    // set of a bigger-k run must contain the smaller-k run's pairs
    val sup = Similarity.ivfPqTopK(q, emb, k = 1000, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(out.forall(sup.contains), "top-k must be a prefix of the full ranking")
    // and probing fewer cells can only shrink the candidate pool
    val sub1 = Similarity.ivfPqTopK(q, emb, k = 1000, nprobe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(sub1.subsetOf(sup), "nprobe=1 candidates must be a subset of nprobe=2")
  }

  test("pqTopKSubspace pick plan: partial WindowGroupLimit bounds the m-partition window") {
    // positive control first: a rank filter over a corpus-wide window
    // WITHOUT the limit-pushdown shape would ship the whole corpus into
    // m partitions; Spark's partial WindowGroupLimitExec before the
    // exchange is what makes the pick scan-linear. Assert it is present
    // and runs in Partial mode upstream of the Final one.
    val emb = Tables.embeddings(spark, sf001)
    val plan = Similarity.pqTopKSubspace(emb.filter($"vec_id" < 5), emb, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
    assert(plan.contains("Partial"),
      "pick window must have a map-side partial group limit")
  }

  test("kCenterCoreset: one exemplar per planted cluster, every member covered") {
    // four tight clusters far apart: greedy farthest-point with k = 4
    // must land one seed in each, and each cluster's radius stays tiny
    // next to the inter-cluster spacing
    val pts = (0 until 40).map { i =>
      val center = i % 4 * 1000.0
      (i.toLong, Seq(center + (i / 4) * 0.1, center - (i / 4) * 0.1))
    }
    val df = pts.toDF("vec_id", "embedding")
    val out = Similarity.kCenterCoreset(df, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 4, s"expected 4 exemplars, got ${out.toSeq}")
    // seeds sit in distinct planted clusters -> each holds exactly 10
    assert(out.forall(_._2 == 10L), s"uneven coverage: ${out.toSeq}")
    // within-cluster squared radius << cluster spacing (1000^2)
    assert(out.forall(_._3 < 100.0), s"radius blew up: ${out.toSeq}")
  }

  test("kCenterCoreset is deterministic across partitionings") {
    val emb = Tables.embeddings(spark, sf001)
    val a = Similarity.kCenterCoreset(emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Similarity.kCenterCoreset(emb.repartition(7), "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  private def nswCents(emb: org.apache.spark.sql.DataFrame) =
    emb.filter($"vec_id" % 97 === 0).orderBy($"vec_id").limit(128)

  test("nswTopK: k ranked rows per query, contiguous ranks, no self-matches") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" < 10)
    val out = Similarity.nswTopK(q, emb, k = 5, centroids = nswCents(emb),
        m = 12, beamWidth = 24, rounds = 4, cellsPerNode = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to 5), s"ranks broken for $qid")
      assert(rows.forall(_._2 != qid), s"self-match for $qid")
    }
  }

  test("nswTopK recall vs brute force on real sf0.001 embeddings") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val nsw = Similarity.nswTopK(q, emb, k = 5, centroids = nswCents(emb),
        m = 12, beamWidth = 24, rounds = 4, cellsPerNode = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & nsw).size.toDouble / exact.size
    // the registered config measures 0.92 at sf0.01; well above the
    // LSH/IVF spec floors — beam search through the bridge edges must
    // stay far from the entry-points-only baseline
    assert(recall >= 0.5, f"NSW recall $recall%.2f collapsed")
  }

  test("nswTopK: cross-cell bridges (p=2) beat within-cell-only (p=1)") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallAt(p: Int) = {
      val got = Similarity.nswTopK(q, emb, k = 5, centroids = nswCents(emb),
          m = 12, beamWidth = 24, rounds = 4, cellsPerNode = p)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    assert(recallAt(2) >= recallAt(1),
      "bridge edges should never hurt recall at the same budget")
  }

  test("nswTopK is deterministic across partitionings") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" < 10)
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.nswTopK(q, c, k = 5, centroids = nswCents(emb),
          m = 12, beamWidth = 24, rounds = 3, cellsPerNode = 2)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    assert(run(emb) == run(emb.repartition(7)))
  }

  test("hnswTopK: k ranked rows per query, contiguous ranks, no self-matches") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" < 10)
    val out = Similarity.hnswTopK(q, emb, k = 5, centroids = nswCents(emb),
        m = 12, beamWidth = 24, upperRounds = 2, lowerRounds = 4,
        cellsPerNode = 2, layerMod = 16, entryFactor = 8)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to 5), s"ranks broken for $qid")
      assert(rows.forall(_._2 != qid), s"self-match for $qid")
    }
  }

  test("hnswTopK recall matches or beats flat NSW at equal beam budget") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val flat = Similarity.nswTopK(q, emb, k = 5, centroids = nswCents(emb),
        m = 12, beamWidth = 24, rounds = 4, cellsPerNode = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val hier = Similarity.hnswTopK(q, emb, k = 5, centroids = nswCents(emb),
        m = 12, beamWidth = 24, upperRounds = 2, lowerRounds = 4,
        cellsPerNode = 2, layerMod = 16, entryFactor = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rFlat = (exact & flat).size.toDouble / exact.size
    val rHier = (exact & hier).size.toDouble / exact.size
    // same m, same beam width; the hierarchy only changes ENTRY
    // points (and its layer-0 seed set contains the flat seed set)
    assert(rHier >= rFlat - 1e-9,
      f"hierarchical recall $rHier%.2f below flat $rFlat%.2f")
  }

  test("hnswTopK is deterministic across partitionings") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" < 10)
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.hnswTopK(q, c, k = 5, centroids = nswCents(emb),
          m = 12, beamWidth = 24, upperRounds = 2, lowerRounds = 3,
          cellsPerNode = 2, layerMod = 16, entryFactor = 8)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    assert(run(emb) == run(emb.repartition(7)))
  }

  test("beam search: big-corpus knobs (visited prune + per-round ckpt) " +
      "are output-identical to the small-corpus path") {
    // graft.sim.beamThreshold=0 forces the >=4M-row plan shape —
    // per-round checkpoints and the visited-set anti-join prune — on
    // the small corpus; the prune is provably output-identical (a
    // dropped candidate can never re-enter a monotone top-B beam),
    // and this pins it for both the flat and hierarchical searches.
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" < 10)
    def both(run: => Set[(Long, Long, Int, Double)]) = {
      val small = run
      spark.conf.set("graft.sim.beamThreshold", "0")
      try { val big = run; (small, big) }
      finally spark.conf.unset("graft.sim.beamThreshold")
    }
    val (nswS, nswB) = both(
      Similarity.nswTopK(q, emb, k = 5, centroids = nswCents(emb),
          m = 12, beamWidth = 24, rounds = 4, cellsPerNode = 2)
        .as[(Long, Long, Double, Int)].collect()
        .map(r => (r._1, r._2, r._4, r._3)).toSet)
    assert(nswS == nswB, "flat NSW diverges under the big-corpus knobs")
    val (hS, hB) = both(
      Similarity.hnswTopK(q, emb, k = 5, centroids = nswCents(emb),
          m = 12, beamWidth = 24, upperRounds = 2, lowerRounds = 3,
          cellsPerNode = 2, layerMod = 16, entryFactor = 8)
        .as[(Long, Long, Double, Int)].collect()
        .map(r => (r._1, r._2, r._4, r._3)).toSet)
    assert(hS == hB, "HNSW diverges under the big-corpus knobs")
  }
}
