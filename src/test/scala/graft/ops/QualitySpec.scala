package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Some(1L), Some("t"), Some(5.0)),
    (Some(2L), Some("f"), Some(15.0)), // out of range
    (Some(2L), Some("x"), None),       // dup key + bad domain
    (None, None, Some(3.0))            // null key, null flag
  ).toDF("id", "flag", "v")

  test("auditRows counts each violation class in one scan") {
    val out = Quality.auditRows(df, Seq(
      Quality.notNull("flag"),
      Quality.inSet("flag", Seq("t", "f")),
      Quality.inRange("v", lit(0.0), lit(10.0))))
      .as[(String, Long)].collect().toMap
    assert(out == Map(
      "not_null_flag" -> 1L,
      "in_set_flag" -> 1L,     // NULL flag is not an in_set violation
      "in_range_v" -> 1L))     // NULL v is not a range violation
  }

  test("auditRows is a single aggregate (no per-check scan)") {
    val plan = Quality.auditRows(df,
      Seq(Quality.notNull("flag"), Quality.notNull("v"), Quality.notNull("id")))
      .queryExecution.executedPlan.toString
    // one scan feeding one aggregate, melted afterwards: exactly one
    // LocalTableScan/Scan appears in the physical plan
    assert(plan.split("Scan").length - 1 <= 2, plan)
  }

  test("auditUniqueKey counts surplus rows per duplicated key") {
    val out = Quality.auditUniqueKey(df.filter($"id".isNotNull), Seq("id"))
      .as[(String, Long)].collect().head
    assert(out == ("unique_key_id", 1L))
  }

  test("auditUniqueKey on unique input reports 0, not null") {
    val out = Quality.auditUniqueKey(
      Seq(1L, 2L).toDF("id"), Seq("id")).as[(String, Long)].collect().head
    assert(out._2 == 0L)
  }

  test("profileNumeric: one scan, exact mean/variance, null guards") {
    val data = Seq(Some(2.0), Some(4.0), Some(6.0), None).toDF("x")
    val p = Quality.profileNumeric(data, Seq("x"))
      .as[(String, Long, Long, Double, Double, Option[Double], Option[Double])]
      .collect().head
    assert(p == (("x", 3L, 1L, 2.0, 6.0, Some(4.0), Some(4.0))))
    // n=1 → variance NULL, not a division error (ANSI 0/0 guard)
    val single = Quality.profileNumeric(Seq(5.0).toDF("x"), Seq("x"))
      .select($"variance").as[Option[Double]].collect().head
    assert(single.isEmpty)
    // multi-column profile stays ONE aggregate over one scan
    val plan = Quality.profileNumeric(df, Seq("v", "id"))
      .queryExecution.executedPlan.toString
    assert(plan.split("Scan").length - 1 <= 2, plan)
  }

  test("histogram: boundary values, under/overflow bins, dense output") {
    val data = Seq(Some(-1.0), Some(0.0), Some(5.0), Some(10.0), Some(25.0),
      Some(20.0), None).toDF("x")
    val h = Quality.histogram(data, "x", lo = 0.0, hi = 20.0, nBuckets = 2)
      .as[(Long, Long)].collect().toMap
    assert(h == Map(
      0L -> 1L, // -1 underflows
      1L -> 2L, // 0 (lower boundary inclusive) and 5
      2L -> 1L, // 10 (bin boundary belongs to the upper bin)
      3L -> 2L  // 20 (hi is exclusive -> overflow) and 25; NULL dropped
    ))
  }

  test("auditForeignKey counts non-null orphans only") {
    val dim = Seq(1L, 2L).toDF("k")
    val fact = Seq(Some(1L), Some(3L), Some(3L), None).toDF("fk")
    val out = Quality.auditForeignKey(fact, "fk", dim, "k")
      .as[(String, Long)].collect().head
    assert(out == ("fk_fk_to_k", 2L)) // the two fk=3 rows; NULL exempt
  }

  test("tableChecksum: invariant to order/partitioning, sensitive to one row") {
    val base = Seq((1L, "a", "g1"), (2L, "b", "g1"), (3L, "c", "g2"))
      .toDF("id", "v", "g")
    def canon = concat_ws("|", col("id").cast("string"), col("v"))
    def sums(df: org.apache.spark.sql.DataFrame) =
      Quality.tableChecksum(df, Seq("g"), canon)
        .as[(String, Long, Long)].collect().toSet
    val ref = sums(base)
    assert(ref.map(_._1) == Set("g1", "g2"))
    // shuffled + repartitioned input: identical checksums
    assert(sums(base.orderBy(col("v").desc).repartition(7)) == ref)
    // one changed value flips exactly its group's checksum
    val mut = Seq((1L, "a", "g1"), (2L, "B", "g1"), (3L, "c", "g2"))
      .toDF("id", "v", "g")
    val got = sums(mut)
    assert(got.find(_._1 == "g2") == ref.find(_._1 == "g2"))
    assert(got.find(_._1 == "g1") != ref.find(_._1 == "g1"))
  }

  test("kAnonymityViolations reports only sub-k classes, with risk") {
    val rows = Seq.fill(5)(("AU", "BLDG")) ++ // safe class (size 5 = k)
      Seq.fill(2)(("AU", "AUTO")) ++          // violating, size 2
      Seq(("NZ", "AUTO"))                     // violating, size 1
    val out = Quality.kAnonymityViolations(
      rows.toDF("nation", "segment"),
      Seq(col("nation"), col("segment")), k = 5)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out == Map(
      ("AU", "AUTO") -> ((2L, 500000L)),
      ("NZ", "AUTO") -> ((1L, 1000000L))))
  }

  test("madOutliers flags a planted spike and survives a zero-MAD group") {
    // group "g": 99 values at 100 +- small jitter, one spike at 10000
    val normal = (0 until 99).map(i => ("g", 100.0 + (i % 7)))
    val spike = Seq(("g", 10000.0))
    // group "flat": all identical -> MAD 0 -> NULL z, no outliers
    val flat = (0 until 20).map(_ => ("flat", 5.0))
    val out = Quality.madOutliers(
      (normal ++ spike ++ flat).toDF("k", "x"), $"k", $"x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(4), Option(r.get(5))))).toMap
    val (nG, outG, maxZ) = out("g")
    assert(nG == 100 && outG == 1, s"exactly the spike flags: $outG")
    assert(maxZ.exists(_.asInstanceOf[Double] > 1000), s"spike z huge: $maxZ")
    val (nF, outF, zF) = out("flat")
    assert(nF == 20 && outF == 0 && zF.isEmpty, "zero-MAD group yields NULL z")
  }

  test("madOutliers is robust where mean/stddev z-scores mask") {
    // two spikes drag stddev so much that a CLASSICAL z misses them both
    val vals = (0 until 50).map(_.toDouble % 5) ++ Seq(1e6, 1e6)
    val df = vals.map(("g", _)).toDF("k", "x")
    val mad = Quality.madOutliers(df, $"k", $"x").select($"n_outliers")
      .as[Long].head()
    assert(mad == 2, s"MAD must flag both planted spikes, got $mad")
    // classical z < 3.5 for the spikes (stddev ~ 1.96e5 under masking)
    val stats = df.agg(avg($"x").as("m"), stddev($"x").as("s"))
      .as[(Double, Double)].head()
    val zClassic = (1e6 - stats._1) / stats._2
    assert(zClassic < 5.5, f"fixture must exhibit masking, z=$zClassic%.1f")
  }

  test("psiDrift: identical distributions give PSI 0; a planted shift is flagged") {
    val ref = (0 until 1000).map(i => ("r", (i % 10) * 10.0 + 5.0))
    // identical shape -> every term 0
    val same = Quality.psiDrift(ref.toDF("g", "x"), ref.toDF("g", "x"),
      $"x", lo = 0.0, hi = 100.0, nBins = 10)
      .select($"psi_micro").as[Long].head()
    assert(same == 0L)
    // shove 30% of mass from the low bins into the top bin
    val cur = ref.map { case (g, x) => (g, if (x < 30) 95.0 else x) }
    val out = Quality.psiDrift(ref.toDF("g", "x"), cur.toDF("g", "x"),
      $"x", lo = 0.0, hi = 100.0, nBins = 10)
    val psi = out.select($"psi_micro").as[Long].head()
    assert(psi > 250000L, s"a 30% mass move must exceed the 0.25 drift bar, got $psi")
    // the emptied bins are degenerate (cur side 0), flagged not fudged
    val degen = out.select($"n_degenerate_bins").as[Long].head()
    assert(degen == 3L, s"three emptied bins must be flagged, got $degen")
  }

  test("psiDrift clamps out-of-range values into the edge bins") {
    val ref = Seq(("g", -50.0), ("g", 500.0), ("g", 50.0))
    val out = Quality.psiDrift(ref.toDF("g", "x"), ref.toDF("g", "x"),
      $"x", lo = 0.0, hi = 100.0, nBins = 10)
      .select($"bin", $"c_ref").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 1L, 5L -> 1L, 9L -> 1L))
  }

  test("dpNoisyCounts: noise is bounded, deterministic, and distribution-shaped") {
    val df = (0 until 2000).map(i => (s"g${i % 200}", i)).toDF("g", "v")
    val out = Quality.dpNoisyCounts(df, Seq($"g"), eps = 0.5)
      .select($"g", $"n_true", $"noise", $"n_noisy").collect()
    assert(out.length == 200)
    out.foreach { r =>
      assert(math.abs(r.getInt(2)) <= 16, "noise must be truncated to [-B, B]")
      assert(r.getLong(3) == math.max(r.getLong(1) + r.getInt(2), 0L))
    }
    // deterministic under re-run and re-partitioning
    val again = Quality.dpNoisyCounts(df.repartition(7), Seq($"g"), eps = 0.5)
      .select($"g", $"noise").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    out.foreach(r => assert(again(r.getString(0)) == r.getInt(2)))
    // shape: mean |noise| for eps=0.5 is ~2alpha/(1-alpha^2)/... ~ 1.9;
    // across 200 groups demand SOME spread and near-zero mean
    val noises = out.map(_.getInt(2))
    assert(noises.distinct.length > 5, "noise must actually vary")
    assert(math.abs(noises.sum.toDouble / noises.length) < 1.0,
      "two-sided noise must be near-zero-mean across many groups")
  }

  test("dpGeomThresholds: CDF thresholds are strictly increasing and cover u-space") {
    val (ts, alpha) = Quality.dpGeomThresholds(0.5, 16)
    assert(ts.length == 32)
    assert(ts.map(_._1) == ts.map(_._1).sorted)
    assert(ts.map(_._2) == (-16 until 16))
    assert(alpha > 0.60 && alpha < 0.61)
    // P(K <= -1) + P(K = 0) = CDF(0): sanity of the closed forms
    val c0 = ts.find(_._2 == 0).get._1.toDouble / math.pow(2, 56)
    assert(math.abs(c0 - (1 - alpha / (1 + alpha))) < 1e-12)
  }

  test("splitLeakage counts overlap keys and leaked rows exactly") {
    // train users {1,2,3}; test rows: u2 x2, u3 x1, u4 x3 -> overlap {2,3}
    val train = Seq(1L, 2L, 3L, 2L).toDF("u")
    val test = Seq(2L, 2L, 3L, 4L, 4L, 4L).toDF("u")
    val r = Quality.splitLeakage(train, test, $"u").collect().head
    val m = r.getValuesMap[Any](Seq("n_train_keys", "n_test_keys",
      "n_overlap_keys", "n_test_rows", "n_test_rows_leaked",
      "overlap_micro", "leaked_rows_micro"))
    assert(m("n_train_keys") == 3L && m("n_test_keys") == 3L)
    assert(m("n_overlap_keys") == 2L)
    assert(m("n_test_rows") == 6L && m("n_test_rows_leaked") == 3L)
    assert(m("overlap_micro") == 666667L) // round(2/3 * 1e6)
    assert(m("leaked_rows_micro") == 500000L)
  }

  test("splitLeakage: a clean entity-level split reports zero leakage") {
    val r = Quality.splitLeakage(
      Seq(1L, 2L).toDF("u"), Seq(3L, 4L).toDF("u"), $"u").collect().head
    assert(r.getAs[Long]("n_overlap_keys") == 0L)
    assert(r.getAs[Long]("overlap_micro") == 0L)
  }
}
