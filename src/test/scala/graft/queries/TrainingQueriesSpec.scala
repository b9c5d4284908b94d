package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic pins for the round-6 training-data batch — properties the
  * oracle hash can't see: the Hilbert mapping really IS a Hilbert
  * curve (bijective, unit-step), span islands really merge, the
  * prefix rerank really retrieves, pruning asymmetry really favors
  * the sorted layout. */
class TrainingQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) =
    Registry.queries(name)(spark, sfDir)

  test("hilbert order-8 is a bijection with unit steps over the full grid") {
    // replay the query's exact round expressions over ALL 65536 cells
    val grid = spark.range(65536L).select(
      (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val masks = Seq(128, 64, 32, 16, 8, 4, 2, 1)
    val mapped = masks.foldLeft(
      grid.withColumn("d", lit(0L))
        .withColumn("x0", col("x")).withColumn("y0", col("y"))) {
      case (df, s) =>
        val rx = s"((x div $s) % 2)"
        val ry = s"((y div $s) % 2)"
        val quad = s"(CASE WHEN $rx = 1 THEN (CASE WHEN $ry = 1 THEN 2 ELSE 3 END)" +
          s" ELSE (CASE WHEN $ry = 1 THEN 1 ELSE 0 END) END)"
        df.selectExpr("x0", "y0",
          s"d + ${s.toLong * s} * $quad AS d",
          s"CASE WHEN $ry = 1 THEN x WHEN $rx = 1 THEN 255 - y ELSE y END AS x",
          s"CASE WHEN $ry = 1 THEN y WHEN $rx = 1 THEN 255 - x ELSE x END AS y")
    }.select(col("x0"), col("y0"), col("d"))
    assert(mapped.select(col("d")).distinct().count() == 65536L,
      "hilbert index must be a bijection on the 256x256 grid")
    assert(mapped.agg(min(col("d")), max(col("d"))).as[(Long, Long)].head()
      == ((0L, 65535L)))
    // THE Hilbert property: consecutive indices are grid neighbours
    val byD = mapped.select(col("d"), col("x0"), col("y0"))
    val a = byD.select(col("d").as("ad"), col("x0").as("ax"), col("y0").as("ay"))
    val b = byD.select((col("d") - 1).as("ad"), col("x0").as("bx"), col("y0").as("by"))
    val steps = a.join(b, "ad")
      .select((abs(col("bx") - col("ax")) + abs(col("by") - col("ay"))).as("step"))
    assert(steps.filter(col("step") =!= 1).count() == 0,
      "every consecutive Hilbert pair must be Manhattan distance 1")
  }

  test("hilbert locality beats zorder beats nothing on avg step") {
    val rows = run("x_layout_hilbert")
      .select(col("curve"), col("avg_step")).as[(String, Double)]
      .collect().toMap
    assert(rows.keySet == Set("hilbert", "zorder", "rowmajor"))
    assert(rows("hilbert") < rows("zorder"),
      s"hilbert ${rows("hilbert")} should beat zorder ${rows("zorder")}")
  }

  test("dup spans: planted shared passage comes back as one merged island") {
    import graft.ops.Sampling
    // doc A and doc B share tokens 10..29 of A (a 20-token passage):
    // 5 duplicated 16-grams, overlapping -> ONE island of 20 tokens each
    val shared = (0 until 20).map(i => s"shared$i").mkString(" ")
    val a = (0 until 10).map(i => s"a$i").mkString(" ") + " " + shared +
      " " + (0 until 10).map(i => s"atail$i").mkString(" ")
    val b = (0 until 4).map(i => s"b$i").mkString(" ") + " " + shared +
      " " + (0 until 6).map(i => s"btail$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val L = 16
    val toks = docs.select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .filter(size(col("t")) >= L)
    val grams = toks.select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(t) - $L)," +
          s" i -> array_join(slice(t, i + 1, $L), ' '))")).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        Sampling.hashValue(col("g")).as("h"))
    val dupH = grams.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("h")
    val hits = grams.join(dupH, "h")
    val spans = hits.groupBy(col("doc_id"))
      .agg(min(col("pos")).as("s"), max(col("pos")).as("e"),
        count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, st, en, n) => id -> ((st, en, n)) }.toMap
    // doc 1: the 20-token passage at positions 10..29 -> 16-gram
    // starts 10..14 (5 overlapping grams, one island); doc 2: at 4..23
    assert(spans(1L) == ((10L, 14L, 5L)), s"doc 1 spans: ${spans(1L)}")
    assert(spans(2L) == ((4L, 8L, 5L)), s"doc 2 spans: ${spans(2L)}")
  }

  test("x_dedup_dup_spans islands cover only the planted overlap on testdata") {
    val out = run("x_dedup_dup_spans")
    val n = out.count()
    assert(n > 0, "testdata corpus has near-dup docs; spans must exist")
    // islands are well-formed: start <= end, n_grams >= 1, tokens = e-s+1
    assert(out.filter(col("span_end") < col("span_start")).count() == 0)
    assert(out.filter(
      col("span_tokens") =!= col("span_end") - col("span_start") + 1)
      .count() == 0)
  }

  test("prefix rerank retrieves a majority of the exact top-5") {
    import graft.core.Tables
    import graft.ops.Similarity
    val emb = Tables.embeddings(spark, sfDir).filter(col("embedding").isNotNull)
    val exact = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 10), emb, k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val reranked = run("x_sim_prefix_rerank")
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    // The testdata embeddings are random — MRL's worst case (nothing
    // concentrates energy in the prefix the way a trained Matryoshka
    // model does), so a 16/64 prefix carries ~25% of the signal.
    // Majority recall here means the mechanism works; a trained
    // embedding space pushes this toward 1.0.
    val recall = exact.intersect(reranked).size.toDouble / exact.size
    assert(recall >= 0.5,
      s"prefix-16 stage-1 at 100 candidates should recall >= 0.5, got $recall")
    // rank-5-per-query structure
    assert(reranked.size == exact.size)
  }

  test("zonemap pruning: sorted layout prunes, hashed layout cannot") {
    val rows = run("x_scale_zonemap_pruning")
      .select(col("layout"), col("n_pruned"), col("rows_match"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rows("range")._2 > 40,
      s"range layout should prune most of 64 shards, pruned ${rows("range")._2}")
    assert(rows("hash")._2 == 0,
      s"hash layout should prune nothing, pruned ${rows("hash")._2}")
    // both layouts agree on the true match count (pruning is lossless)
    assert(rows("range")._3 == rows("hash")._3)
  }

  test("dsir separates distinct vocabularies (planted corpus)") {
    import graft.ops.Sampling
    // The testdata languages share ONE token pool, so lang carries no
    // distributional signal there (the registered query is pinned
    // structurally below). Plant the signal DSIR is built for: target
    // docs draw from vocab A, others from vocab B.
    val docs = ((0 until 20).map(i =>
        (i.toLong, "en", (0 until 30).map(j => s"alpha${(i + j) % 40}").mkString(" "))) ++
      (20 until 40).map(i =>
        (i.toLong, "de", (0 until 30).map(j => s"beta${(i + j) % 40}").mkString(" "))))
      .toDF("doc_id", "lang", "text")
    val B = 1024
    val toks = docs.select(col("doc_id"), col("lang"),
        explode(split(lower(col("text")), " ")).as("tok"))
      .withColumn("b", Sampling.hashBucket(col("tok"), B))
    val raw = toks.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = toks.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val totals = toks.agg(count(lit(1)).as("nr"),
      count(when(col("lang") === "en", 1)).as("nt"))
    val lp = raw.join(tgt, Seq("b"), "left").crossJoin(broadcast(totals))
      .select(col("b"), expr(
        s"""CAST(ROUND(LN(
           |  (CAST(COALESCE(ct, 0) + 1 AS DOUBLE) * CAST(nr + $B AS DOUBLE))
           |  / (CAST(cr + 1 AS DOUBLE) * CAST(nt + $B AS DOUBLE))
           |) * 1000000) AS BIGINT)""".stripMargin).as("lp_micro"))
    val dw = toks.join(broadcast(lp), "b")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("lp_micro")).as("w"))
      .select(col("lang"), col("w")).as[(String, Long)].collect()
    val minEn = dw.filter(_._1 == "en").map(_._2).min
    val maxDe = dw.filter(_._1 == "de").map(_._2).max
    assert(minEn > maxDe,
      s"every target-vocab doc must outweigh every other ($minEn vs $maxDe)")
  }

  test("dsir registered query is a well-formed top-50") {
    val top = run("x_curation_dsir")
      .select(col("rank"), col("weight_micro"))
      .as[(Int, Long)].collect().sortBy(_._1)
    assert(top.length == 50)
    assert(top.map(_._1).toSeq == (1 to 50))
    // weights non-increasing down the ranking
    top.sliding(2).foreach { case Array((_, w1), (_, w2)) =>
      assert(w1 >= w2, s"weights must be non-increasing: $w1 then $w2")
    }
  }

  test("bpe train learns the hand-traced merges on a planted corpus") {
    import graft.ops.TextOps
    // corpus: "aaab" x2, "ab" x1. Hand trace:
    //   round 1: (a,a) weight 4 (two overlapping occurrences per "aaab",
    //     greedy-leftmost merges only the first) -> aaab = [aa, a, b]
    //   round 2: (a,b) weight 3 -> aaab = [aa, ab], ab = [ab]
    //   round 3: (aa, ab) weight 2 -> aaab = [aaab]
    //   round 4+: no pairs left -> no further merge rows
    val docs = Seq("aaab aaab ab").toDF("text")
    val out = TextOps.bpeTrain(docs, col("text"), rounds = 5)
      .select(col("merge_round"), col("a"), col("b"), col("weight"),
        col("corpus_tokens"))
      .as[(Int, String, String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
      Seq((1, "a", "a", 4L), (2, "a", "b", 3L), (3, "aa", "ab", 2L)),
      s"unexpected merge table: ${out.mkString(", ")}")
    // compression trajectory: 10 chars -> 8 -> 5 -> 3 corpus tokens
    assert(out.map(_._5).toSeq == Seq(8L, 5L, 3L))
  }

  test("bpe train: overlapping runs merge greedy-leftmost") {
    import graft.ops.TextOps
    // "aaaa": matched at idx 1,2,3 (one island) -> heads at 1 and 3
    // -> [aa, aa]; round 2 merges (aa, aa) -> [aaaa]
    val docs = Seq("aaaa").toDF("text")
    val out = TextOps.bpeTrain(docs, col("text"), rounds = 2)
      .select(col("merge_round"), col("a"), col("b"), col("vocab_tokens"))
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1, "a", "a", 2L), (2, "aa", "aa", 1L)))
  }

  test("boruvka round halves components: picked forest is spanning and acyclic-enough") {
    val out = run("x_graph_boruvka_step")
      .select(col("n_members"), col("n_edges_picked"))
      .as[(Long, Long)].collect()
    val nodes = out.map(_._1).sum
    val comps = out.length.toLong
    val edges = out.map(_._2).sum
    // Boruvka invariant: every node joined SOME component of >= 2 nodes,
    // so after one round comps <= nodes / 2
    assert(comps <= nodes / 2, s"$comps components for $nodes nodes")
    // a forest of c components over n nodes picks >= n - c distinct
    // edges (each node picked one, dedup only removes mutual picks) and
    // < n (it is a pseudo-forest)
    assert(edges >= nodes - comps && edges < nodes,
      s"picked $edges edges for $nodes nodes in $comps components")
    out.foreach { case (m, _) => assert(m >= 2) }
  }

  test("textrank ranks connector words above leaves (planted graph)") {
    import graft.ops.Graph
    // star: hub adjacent to 6 leaves -> hub must rank first
    val docs = (0 until 6).map(i => s"hub leaf$i").mkString(" hub ")
    val toks = Seq(docs).toDF("text")
      .select(split(lower(col("text")), " ").as("t"))
    val pairs = toks.select(explode(expr(
        "transform(sequence(0, size(t) - 2)," +
          " i -> struct(element_at(t, i + 1) AS a, element_at(t, i + 2) AS b))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b"))
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
    val top = Graph.pageRankFixedPoint(edges, iters = 3)
      .orderBy(col("rank_fp").desc, col("node"))
      .select(col("node")).as[String].head()
    assert(top == "hub", s"expected hub to rank first, got $top")
  }

  test("chao1 is a lower-bounded richness estimate above observed types") {
    val rows = run("x_text_vocab_chao1")
      .select(col("d_types"), col("f1"), col("chao1_milli"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (d, f1, chao) =>
      assert(chao >= d * 1000, "estimate can never fall below observed types")
      if (f1 == 0) assert(chao == d * 1000, "no singletons -> saturated")
    }
  }

  test("fisher ratio separates the planted dim and the query is well-formed") {
    // dim 1 separates labels cleanly (label 0 -> -1, label 1 -> +1),
    // dim 2 varies label-independently: between-class variance of dim 1
    // dominates, within-class variance is ~0 -> fisher(dim1) >> fisher(dim2)
    val emb = (0 until 40).map { i =>
      val label = i % 2
      val d2 = (i % 7).toDouble / 7.0
      (label, if (label == 0) -1.0 else 1.0, d2)
    }.toDF("label", "x1", "x2")
    def fisher(c: String): Double = {
      val per = emb.groupBy(col("label"))
        .agg(sum(expr(s"CAST(ROUND($c * 1000) AS BIGINT)")).as("sml"),
          sum(expr(s"CAST(ROUND($c * $c * 1000000) AS BIGINT)")).as("ssql"),
          count(lit(1)).as("nl"))
      per.agg(
        sum(col("sml")).as("sm_all"), sum(col("nl")).as("n"),
        sum(expr("CAST(ROUND((CAST(sml AS DOUBLE) / CAST(1000 AS DOUBLE) / nl)"
          + " * (CAST(sml AS DOUBLE) / CAST(1000 AS DOUBLE) / nl)"
          + " * nl * 1000000) AS BIGINT)")).as("sq_means_micro"),
        sum(expr("CAST(ROUND((CAST(ssql AS DOUBLE) / CAST(1000000 AS DOUBLE)"
          + " - (CAST(sml AS DOUBLE) / CAST(1000 AS DOUBLE) / nl)"
          + " * (CAST(sml AS DOUBLE) / CAST(1000 AS DOUBLE) / nl) * nl)"
          + " * 1000000) AS BIGINT)")).as("ssw_micro"))
        .select(expr("ROUND(CAST(sq_means_micro"
          + " - CAST(ROUND((CAST(sm_all AS DOUBLE) / CAST(1000 AS DOUBLE) / n)"
          + " * (CAST(sm_all AS DOUBLE) / CAST(1000 AS DOUBLE) / n)"
          + " * n * 1000000) AS BIGINT) AS DOUBLE)"
          + " / CAST(CASE WHEN ssw_micro <= 0 THEN 1000000"
          + " ELSE ssw_micro END AS DOUBLE), 6)"))
        .as[Double].head()
    }
    assert(fisher("x1") > 100 * fisher("x2"),
      s"planted dim must dominate: ${fisher("x1")} vs ${fisher("x2")}")
    assert(run("x_embed_fisher").count() == 8)
  }

  test("bpe apply: fertility is >= 1 piece per word and <= word length") {
    val rows = run("x_text_bpe_apply")
      .select(col("n_words"), col("n_pieces_total"), col("pieces_per_word_milli"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, p, milli) =>
      assert(p >= w, "every word is at least one piece")
      assert(milli >= 1000)
    }
  }

  test("whitening stats are sane and z-scores standardize") {
    val out = run("x_embed_whitening")
    assert(out.count() == 64)
    assert(out.filter(col("variance") < 0).count() == 0)
    assert(out.filter(col("n") =!= out.agg(max(col("n"))).head().getLong(0))
      .count() == 0, "every dim sees every vector")
  }

  test("naive bayes: planted disjoint vocabularies classify perfectly") {
    import graft.ops.TextOps
    // langs with zero shared tokens; ids 1..20 -> test docs 5,10,15,20
    val docs = (1L to 20L).map { i =>
      if (i % 2 == 0) (i, "aa", "alpha beta gamma alpha beta")
      else (i, "zz", "omega psi chi omega psi")
    }.toDF("doc_id", "lang", "text")
    val conf = TextOps.naiveBayesConfusion(docs, buckets = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(conf == Map(("aa", "aa") -> 2L, ("zz", "zz") -> 2L),
      s"expected perfect diagonal, got $conf")
  }

  test("naive bayes on sf0.001: confusion rows cover exactly the held-out docs") {
    val out = run("x_ml_naive_bayes")
    val total = out.agg(sum(col("n_docs"))).head().getLong(0)
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull && col("lang").isNotNull
        && col("doc_id") % 5 === 0).count()
    assert(total == expected)
  }

  test("rouge: hand-traced overlap and the identical-pair fixed point") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "a a b"), (2L, "a b b"),   // uni overlap 2/3, bi overlap 1/2
      (3L, "x y z"), (4L, "x y z"))   // identical -> f = 1 at both n
      .toDF("doc_id", "text")
    val out = TextOps.rougeAdjacent(docs)
      .collect().map(r => (r.getLong(0), r.getInt(2)) ->
        (r.getLong(3), r.getDouble(8))).toMap
    assert(out((1L, 1))._1 == 2L)
    assert(math.abs(out((1L, 1))._2 - 2.0 / 3) < 1e-6)
    assert(out((1L, 2))._1 == 1L)
    assert(math.abs(out((1L, 2))._2 - 0.5) < 1e-6)
    assert(out((3L, 1))._2 == 1.0 && out((3L, 2))._2 == 1.0)
    // pair (2,3) exists too (adjacent ids) but is fully disjoint
    assert(out((2L, 1))._1 == 0L && out((2L, 1))._2 == 0.0)
  }

  test("random walks: every hop follows a real edge, 5 steps per walk") {
    val out = run("x_graph_random_walk")
    val perWalk = out.groupBy(col("walk_id")).count().collect()
    assert(perWalk.nonEmpty && perWalk.forall(_.getLong(1) == 5L),
      "each walk must emit exactly steps 0..4")
    // rebuild the edge set the query walks over
    val base = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val edges = base.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(base.select(col("b").as("src"), col("a").as("dst")))
    val hops = out.select(col("walk_id"), col("step"), col("node").as("src"))
      .join(out.select(col("walk_id"), (col("step") - 1).as("step"),
        col("node").as("dst")), Seq("walk_id", "step"))
    assert(hops.join(edges, Seq("src", "dst"), "left_anti").count() == 0,
      "every consecutive walk pair must be a graph edge")
  }

  test("kmeans|| oversample: nonempty, d2 >= 0, seed center never selected") {
    val out = run("x_ml_kmeans_par_init").collect()
    assert(out.nonEmpty && out.length <= 64,
      s"expected a small candidate set (~l=8), got ${out.length}")
    assert(out.forall(_.getAs[Long]("d2_micro") >= 0L))
    val seedId = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .agg(min(col("vec_id"))).head().getLong(0)
    assert(!out.exists(_.getAs[Long]("vec_id") == seedId),
      "the seed center has d2 = 0 and can never pass the threshold")
  }

  test("kneser-ney: probabilities in (0, 1], ranks are 1..100") {
    val out = run("x_text_kneser_ney").collect()
    assert(out.length == 100)
    assert(out.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 100))
    out.foreach { r =>
      val p = r.getAs[Long]("p_kn_micro")
      assert(p > 0L && p <= 1000000L, s"p_kn out of range: $p")
      assert(r.getAs[Long]("c12") >= 3L)
      assert(r.getAs[Long]("n1bw") >= 1L && r.getAs[Long]("n1fw") >= 1L)
    }
  }

  test("heaps law: both growth curves are monotone and vocab <= tokens") {
    val rows = run("x_text_heaps_law").orderBy(col("dec")).collect()
    assert(rows.length == 10)
    val n = rows.map(_.getAs[Long]("n_cum"))
    val v = rows.map(_.getAs[Long]("v_cum"))
    assert(n.zip(n.tail).forall { case (a, b) => a < b })
    assert(v.zip(v.tail).forall { case (a, b) => a <= b })
    assert(n.zip(v).forall { case (nt, vt) => vt <= nt })
    val beta = rows.head.getAs[Long]("beta_micro")
    assert(rows.forall(_.getAs[Long]("beta_micro") == beta))
    assert(beta >= 0L && beta <= 1000000L,
      s"vocab cannot grow faster than tokens: beta_micro = $beta")
    // this corpus' vocabulary saturates in decile 0 (31 types), the
    // beta = 0 fixed point; a still-growing vocab must fit beta > 0
    if (v.last > v.head) assert(beta > 0L)
    else assert(beta == 0L, "saturated vocab must fit a flat curve")
  }

  test("cdc chunking: per-doc invariants and token conservation") {
    val rows = run("x_dedup_cdc_chunking").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (nc, nd, nt) = (r.getAs[Long]("n_chunks"),
        r.getAs[Long]("n_dup_chunks"), r.getAs[Long]("n_tokens"))
      assert(nc >= 1L && nd >= 0L && nd <= nc && nt >= nc)
      assert(r.getAs[Long]("dup_ratio_milli") <= 1000L)
    }
    val totalToks = rows.map(_.getAs[Long]("n_tokens")).sum
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .select(size(split(lower(col("text")), " ")).as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(totalToks == expected, "chunking must conserve every token")
  }

  test("holt: series head has level = y*1e6, zero trend, forecast = level") {
    val out = run("x_ts_holt")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("priority")).orderBy(col("ym"))
    val first = out.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).collect()
    assert(first.nonEmpty)
    first.foreach { r =>
      assert(r.getAs[Long]("level_micro") == r.getAs[Long]("n") * 1000000L)
      assert(r.getAs[Long]("trend_micro") == 0L)
      assert(r.getAs[Long]("forecast_micro") == r.getAs[Long]("level_micro"))
    }
  }

  test("zipf fit: negative slope, r2 in [0,1], top-20 ranks") {
    val rows = run("x_text_zipf_fit").orderBy(col("rank")).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 20L))
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    val slope = rows.head.getAs[Long]("slope_micro")
    val r2 = rows.head.getAs[Long]("r2_micro")
    assert(slope < 0L, s"zipf slope must be negative, got $slope")
    assert(r2 >= 0L && r2 <= 1000000L)
  }

  test("stl: additive identity holds wherever trend is defined") {
    val rows = run("x_ts_stl_decompose").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("dow") >= 0 && r.getAs[Int]("dow") <= 6)
      if (!r.isNullAt(r.fieldIndex("trend_milli"))) {
        val y = r.getAs[Long]("y")
        assert(y * 1000L == r.getAs[Long]("trend_milli")
          + r.getAs[Long]("seasonal_milli") + r.getAs[Long]("residual_milli"),
          "y*1000 must equal trend + seasonal + residual exactly")
      }
    }
  }

  test("modularity: degree masses partition S, |Q| bounded by 1") {
    val rows = run("x_graph_modularity").collect()
    assert(rows.length == 25, "one community per nation")
    val sTot = rows.head.getAs[Long]("s_tot")
    assert(rows.map(_.getAs[Long]("d_sym")).sum == sTot)
    assert(rows.map(_.getAs[Long]("intra_sym")).sum <= sTot)
    val q = rows.head.getAs[Long]("q_micro")
    assert(rows.forall(_.getAs[Long]("q_micro") == q))
    assert(q >= -1000000L && q <= 1000000L)
  }

  test("dbscan: labels partition the point cloud") {
    val rows = Registry.queries("x_geo_dbscan_core")(spark, sfDir).collect()
    val byLabel = rows.map(r =>
      r.getAs[String]("label") -> r.getAs[Long]("n_points")).toMap
    assert(byLabel.keySet.subsetOf(Set("core", "border", "noise")))
    val total = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(byLabel.values.sum == total,
      "every point gets exactly one label")
  }

  test("jensen-shannon: bounded by ln 2, same-corpus vocab stays undrifted") {
    val r = run("x_text_jensen_shannon").head()
    val js = r.getAs[Long]("js_micro")
    assert(js >= 0L && js <= 693148L, s"JS must sit in [0, ln 2]: $js")
    assert(r.getAs[Long]("np") > 0L && r.getAs[Long]("nq") > 0L)
  }

  test("attribution: first and last credits both count attributed purchases") {
    val rows = run("x_events_attribution").collect()
    assert(rows.nonEmpty)
    val first = rows.map(_.getAs[Long]("first_credit")).sum
    val last = rows.map(_.getAs[Long]("last_credit")).sum
    assert(first == last,
      "every attributed purchase has exactly one first and one last touch")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_touches") >= r.getAs[Long]("first_credit"))
      assert(r.getAs[Long]("linear_milli") >= 0L)
    }
    // linear credit conserves <= 1000 milli per attributed purchase
    assert(rows.map(_.getAs[Long]("linear_milli")).sum <= first * 1000L)
  }

  test("pk uniqueness: catches lineitem's planted dup keys, clean elsewhere") {
    val rows = Registry.queries("x_dq_pk_uniqueness")(spark, sfDir)
      .collect().map(r => r.getAs[String]("relation") -> r).toMap
    assert(rows.size == 6)
    val li = rows("lineitem.(orderkey,linenumber)")
    assert(li.getAs[Long]("n_dup_keys") > 0L,
      "the testdata plants duplicate (orderkey, linenumber) pairs")
    assert(li.getAs[Long]("max_multiplicity") > 1L)
    (rows - "lineitem.(orderkey,linenumber)").values.foreach { r =>
      assert(r.getAs[Long]("n_dup_keys") == 0L)
      assert(r.getAs[Long]("n_keys") == r.getAs[Long]("n_rows"))
    }
  }

  test("prf eval: rates in [0,1], macro-F1 is the mean of per-class F1") {
    val rows = run("x_ml_prf_eval").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("precision", "recall", "f1").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c out of range: $v")
      }
    }
    val macroF1 = rows.head.getAs[Double]("macro_f1")
    val mean = rows.map(_.getAs[Double]("f1")).sum / rows.length
    assert(math.abs(macroF1 - mean) < 1e-5)
  }

  test("rfm: quintiles in 1..5 and user conservation") {
    val rows = run("x_events_rfm").collect()
    Seq("rq", "fq", "mq").foreach { c =>
      assert(rows.forall { r =>
        val q = r.getAs[Int](c); q >= 1 && q <= 5
      })
    }
    val total = rows.map(_.getAs[Long]("n_users")).sum
    val purchasers = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase" && col("ts").isNotNull
        && col("user_id").isNotNull && col("value").isNotNull)
      .select(col("user_id")).distinct().count()
    assert(total == purchasers)
  }

  test("mmr: 5 distinct picks per query from the top-20, seeded by top-1") {
    val rows = run("x_sim_mmr").collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 3)
    byQuery.values.foreach { qr =>
      assert(qr.map(_.getAs[Int]("pos")).sorted.toSeq == (1 to 5))
      assert(qr.map(_.getAs[Long]("neighbor_id")).distinct.length == 5,
        "MMR must never select the same candidate twice")
      val seed = qr.find(_.getAs[Int]("pos") == 1).get
      assert(seed.isNullAt(seed.fieldIndex("score_micro")))
      assert(qr.filter(_.getAs[Int]("pos") > 1)
        .forall(!_.isNullAt(seed.fieldIndex("maxsim_micro"))))
      // the seed is the relevance argmax: nothing beats its rel
      val maxRel = qr.map(_.getAs[Long]("rel_micro")).max
      assert(seed.getAs[Long]("rel_micro") == maxRel)
    }
  }

  test("hive pruning: the probed scan's PartitionFilters prune most day dirs") {
    val (full, pruned) = LayoutQueries.hivePrunedScan(spark, sfDir)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("(day"),
      plan.take(400))
    val allDays = full.select(col("day")).distinct().count()
    val readFiles = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    val readDays = readFiles.map(f =>
      f.split("/").find(_.startsWith("day=")).get).distinct
    assert(readDays.length <= 7, s"probe spans 7 days, read: ${readDays.length}")
    assert(allDays > readDays.length * 2L,
      s"pruning must skip most of $allDays day dirs")
  }

  test("survival: risk set shrinks monotonically and conserves users") {
    val rows = run("x_events_survival").orderBy(col("t")).collect()
    assert(rows.nonEmpty)
    val risk = rows.map(_.getAs[Long]("n_risk"))
    assert(risk.zip(risk.tail).forall { case (a, b) => a > b })
    val users = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id")).distinct().count()
    assert(risk.head == users, "everyone is at risk at the first duration")
    assert(rows.map(r => r.getAs[Long]("d_events")
      + r.getAs[Long]("n_censored")).sum == users)
    val ch = rows.map(_.getAs[Long]("cum_hazard_micro"))
    assert(ch.zip(ch.tail).forall { case (a, b) => a <= b })
  }

  test("chained windows: daily rollup matches batch, trailing day withheld") {
    val out = run("x_stream_chained_windows").collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val h = r.getAs[Long]("n_hours"); h >= 1L && h <= 24L
    })
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("ts").isNotNull)
      .groupBy(date_trunc("day", col("ts")).as("day_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    // every emitted (day, type) agrees with the batch count; the only
    // missing keys are in the withheld trailing partial day
    val outKeys = out.map(r =>
      (r.getTimestamp(0), r.getAs[String]("event_type"))).toSet
    out.foreach { r =>
      val k = (r.getTimestamp(0), r.getAs[String]("event_type"))
      assert(batch(k) == r.getAs[Long]("n_events"), s"mismatch at $k")
    }
    val missingDays = batch.keySet.diff(outKeys).map(_._1)
    assert(missingDays.size <= 10,
      s"only trailing-day keys may be withheld, missing: $missingDays")
    if (missingDays.nonEmpty)
      assert(missingDays.forall(_.after(out.map(_.getTimestamp(0)).max)),
        "withheld keys must all sit after the last emitted day")
  }

  test("burstiness: spectrum sorted, VMR nonnegative, df <= tf") {
    val rows = run("x_text_burstiness").orderBy(col("rank")).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    val v = rows.map(_.getAs[Long]("vmr_micro"))
    assert(v.zip(v.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("vmr_micro") >= 0L)
      assert(r.getAs[Long]("df") <= r.getAs[Long]("tf"))
      assert(r.getAs[Long]("tf") >= 100L)
    }
  }

  test("gmm e-step: every vector soft-assigned, best responsibility >= 1/4") {
    val rows = run("x_ml_gmm_estep").collect()
    assert(rows.length == 4, "four modulus-sampled centers")
    assert(rows.forall(_.getAs[Long]("cid") % 97 == 0))
    val total = rows.map(_.getAs[Long]("n_assigned")).sum
    val expected = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("embedding").isNotNull).count()
    assert(total == expected)
    rows.foreach { r =>
      val m = r.getAs[Long]("mean_r_milli")
      assert(m >= 250L && m <= 1000L,
        s"argmax responsibility must be >= uniform 1/4: $m")
    }
  }

  test("seasonal strength: both strengths in [0,1], seasonal beats trend here") {
    val r = run("x_ts_seasonal_strength").head()
    val fs = r.getAs[Double]("f_seasonal")
    val ft = r.getAs[Double]("f_trend")
    assert(fs >= 0.0 && fs <= 1.0 && ft >= 0.0 && ft <= 1.0)
    assert(r.getAs[Long]("n") > 0L)
    // the synthetic events carry weekly structure and no trend
    assert(fs > ft, s"weekly signal should dominate: fs=$fs ft=$ft")
  }

  test("powerlaw alpha: tail subset, alpha > 1, degree stats consistent") {
    val r = run("x_graph_powerlaw_alpha").head()
    assert(r.getAs[Long]("n_tail") <= r.getAs[Long]("n_nodes"))
    assert(r.getAs[Long]("max_deg") >= 5L)
    assert(r.getAs[Long]("mean_deg_milli") >= 1000L,
      "mean degree of a graph with edges is >= 1")
    assert(r.getAs[Long]("alpha_micro") > 1000000L,
      "the MLE exponent is always > 1")
  }

  test("forecast baselines: MAEs nonnegative, lag counts consistent") {
    val rows = run("x_ts_forecast_baselines").collect()
    assert(rows.length == 5, "one row per order priority")
    rows.foreach { r =>
      assert(r.getAs[Long]("mae_naive_milli") >= 0L)
      assert(r.getAs[Long]("mae_seasonal_milli") >= 0L)
      assert(r.getAs[Double]("seasonal_vs_naive") >= 0.0)
      assert(r.getAs[Long]("n_months") > 12L,
        "the series must span more than a year for lag-12 to exist")
    }
  }

  test("map/mrr eval: per-query invariants hold on sf0.001") {
    val rows = run("x_eval_map_mrr").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val ap = r.getAs[Double]("ap")
      val rr = r.getAs[Double]("rr")
      val nRel = r.getAs[Long]("n_rel_topk")
      val first = r.getAs[Long]("first_rel_rank")
      assert(ap >= 0.0 && ap <= 1.0)
      assert(rr == 0.0 || (rr >= 0.1 - 1e-9 && rr <= 1.0))
      assert(nRel >= 0L && nRel <= 10L)
      assert((first == 0L) == (nRel == 0L),
        "first_rel_rank = 0 iff no relevant in top-10")
      if (first == 1L) assert(rr == 1.0)
    }
  }
}
