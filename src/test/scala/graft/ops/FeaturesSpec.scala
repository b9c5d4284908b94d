package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def enc(rows: Seq[(String, java.lang.Double)], m: Double = 2.0) =
    Features.targetEncodeLoo(rows.toDF("cat", "t"), "cat", "t", m)
      .select($"cat", $"t", $"enc")
      .as[(String, Option[Double], Option[Double])].collect()

  test("targetEncodeLoo excludes the row's own target (no label leak)") {
    // cat a: targets 10, 20; global mean g = (10+20+30)/3 = 20, m = 2
    // row(a,10): (30-10+2*20)/(2-1+2) = 60/3 = 20
    // row(a,20): (30-20+40)/3 = 50/3
    // row(b,30): (30-30+40)/(1-1+2) = 20  (singleton -> global mean)
    val out = enc(Seq(("a", 10.0), ("a", 20.0), ("b", 30.0))).toSet
    def d(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out == Set(
      ("a", Some(10.0), Some(20.0)),
      ("a", Some(20.0), Some(d(50.0 / 3))),
      ("b", Some(30.0), Some(20.0))))
  }

  test("targetEncodeLoo: singleton categories collapse to the global mean exactly") {
    val out = enc(Seq(("x", 1.0), ("y", 5.0), ("z", 12.0)))
    val g = (1.0 + 5.0 + 12.0) / 3
    out.foreach { case (c, _, e) =>
      assert(e.contains(math.rint(g * 1e6) / 1e6), s"$c -> $e, want $g") }
  }

  test("targetEncodeLoo passes NULL category/target through with NULL enc") {
    val out = enc(Seq(("a", 1.0), ("a", 3.0), (null, 9.0), ("a", null)))
    assert(out.count(_._3.isEmpty) == 2)
    // the NULL rows are excluded from the stats: for row (a,1):
    // S_a=4, n_a=2, g=(1+3)/2=2 -> (4-1+2*2)/(2-1+2)=7/3
    val r = out.find(r => r._1 == "a" && r._2.contains(1.0)).get
    assert(r._3.contains(math.rint(7.0 / 3 * 1e6) / 1e6))
  }

  test("targetEncodeLoo shrinks toward the global mean as priorWeight grows") {
    val rows = Seq(("a", 100.0), ("a", 100.0), ("a", 100.0), ("b", 0.0),
      ("b", 0.0), ("b", 0.0)).map { case (c, t) => (c, t: java.lang.Double) }
    val g = 50.0
    val weak = enc(rows, m = 0.1).filter(_._1 == "a").head._3.get
    val strong = enc(rows, m = 1000.0).filter(_._1 == "a").head._3.get
    assert(math.abs(strong - g) < math.abs(weak - g),
      s"m=1000 ($strong) should sit closer to g=$g than m=0.1 ($weak)")
  }

  test("quantileBin: equal-population bins on uniform data, bounded range, monotone") {
    val df = (1 to 400).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val out = Features.quantileBin(df, "grp", col("v"), nBins = 4)
      .select($"v", $"bin").as[(Double, Int)].collect()
    assert(out.forall { case (_, b) => b >= 0 && b < 4 })
    val byBin = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byBin.keySet == Set(0, 1, 2, 3))
    byBin.values.foreach(n => assert(math.abs(n - 100) <= 1, byBin.toString))
    val sorted = out.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b },
      "bins must be monotone in the value")
  }

  test("quantileBin bins per group independently") {
    // group a: values 1..4; group b: values 101..104 — each group's
    // bins must span 0/1 regardless of the other group's scale
    val df = (Seq.tabulate(4)(i => ("a", i + 1.0)) ++
      Seq.tabulate(4)(i => ("b", i + 101.0))).toDF("grp", "v")
    val out = Features.quantileBin(df, "grp", col("v"), nBins = 2)
      .select($"grp", $"v", $"bin").as[(String, Double, Int)].collect()
    Seq("a", "b").foreach { g =>
      val bins = out.filter(_._1 == g).sortBy(_._2).map(_._3).toSeq
      assert(bins == Seq(0, 0, 1, 1), s"group $g got $bins")
    }
  }

  test("targetEncodeLoo plans no per-category window (aggregate+join shape)") {
    val df = Seq(("a", 1.0), ("b", 2.0)).toDF("cat", "t")
    val plan = Features.targetEncodeLoo(df, "cat", "t", 5.0)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.isEmpty, s"window found in:\n${plan.treeString}")
  }

  private def alsRatings = Seq(
    (1L, 10L, 4L), (1L, 11L, 2L), (1L, 12L, 5L),
    (2L, 10L, 1L), (2L, 13L, 3L),
    (3L, 14L, 7L)
  ).toDF("u", "it", "r")

  test("alsUserStep equals a driver-side re-solve of the same integer normal equations") {
    val L = 100000L
    // recompute the hash factors through the SAME operator primitive,
    // then solve per user in plain Scala — must match bit-for-bit
    val f = alsRatings.select($"u", $"r",
        (Sampling.hashValue(concat_ws(":", lit("alsq1"), $"it".cast("string")))
          % 2001 - 1000).as("q1"),
        (Sampling.hashValue(concat_ws(":", lit("alsq2"), $"it".cast("string")))
          % 2001 - 1000).as("q2"))
      .as[(Long, Long, Long, Long)].collect()
    val expect = f.groupBy(_._1).map { case (u, rows) =>
      val a11 = rows.map(t => t._3 * t._3).sum
      val a12 = rows.map(t => t._3 * t._4).sum
      val a22 = rows.map(t => t._4 * t._4).sum
      val b1 = rows.map(t => t._2 * t._3).sum
      val b2 = rows.map(t => t._2 * t._4).sum
      val det = (a11 + L) * (a22 + L) - a12 * a12
      u -> (((a22 + L) * b1 - a12 * b2).toDouble / det.toDouble * 1000.0,
        ((a11 + L) * b2 - a12 * b1).toDouble / det.toDouble * 1000.0)
    }
    val got = Features.alsUserStep(alsRatings, "u", "it", $"r")
      .select($"u", $"p1", $"p2").as[(Long, Double, Double)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    expect.foreach { case (u, (p1, p2)) =>
      assert(got(u) == ((p1, p2)), s"user $u: got ${got(u)}, expect ($p1,$p2)")
    }
  }

  test("alsUserStep output minimizes the regularized least-squares loss") {
    val lam = 0.1
    val f = alsRatings.select($"u", $"r",
        ((Sampling.hashValue(concat_ws(":", lit("alsq1"), $"it".cast("string")))
          % 2001 - 1000).cast("double") / 1000.0).as("q1"),
        ((Sampling.hashValue(concat_ws(":", lit("alsq2"), $"it".cast("string")))
          % 2001 - 1000).cast("double") / 1000.0).as("q2"))
      .as[(Long, Long, Double, Double)].collect().groupBy(_._1)
    def loss(u: Long, p1: Double, p2: Double): Double =
      f(u).map { case (_, r, q1, q2) =>
        val e = r - (p1 * q1 + p2 * q2); e * e
      }.sum + lam * (p1 * p1 + p2 * p2)
    val got = Features.alsUserStep(alsRatings, "u", "it", $"r")
      .select($"u", $"p1", $"p2").as[(Long, Double, Double)].collect()
    got.foreach { case (u, p1, p2) =>
      val base = loss(u, p1, p2)
      for (d <- Seq(0.05, -0.05); axis <- Seq(0, 1)) {
        val (t1, t2) = if (axis == 0) (p1 + d, p2) else (p1, p2 + d)
        assert(base <= loss(u, t1, t2) + 1e-9,
          s"user $u: perturbation ($t1,$t2) beats the solve")
      }
      assert(base <= loss(u, 0.0, 0.0), s"user $u: zero vector beats the solve")
    }
  }

  test("hashedFeatures: slots sum signed contributions exactly and row-locally") {
    val df = Seq((1L, "A", 10L), (2L, "B", 20L), (3L, "A", 30L))
      .toDF("id", "cat", "v")
    val out = Features.hashedFeatures(df, $"id",
      Seq(concat(lit("cat="), $"cat") -> lit(1L), lit("num") -> $"v"), dim = 4)
    assert(out.columns.toSeq == Seq("id", "f0", "f1", "f2", "f3"))
    val rows = out.collect().map(r =>
      r.getLong(0) -> (1 to 4).map(r.getLong(_)).toSeq).toMap
    // every row's slot L1 mass equals |sign*1| + |sign*v| unless the two
    // features collide into one slot with opposite signs
    val r1 = rows(1L)
    assert(r1.map(math.abs).sum == 11L || r1.map(math.abs).sum == 9L)
    // same cat contributes identically (same bucket, same sign): rows 1
    // and 3 differ only in the numeric feature's contribution
    val diff = rows(1L).zip(rows(3L)).map { case (a, b) => b - a }
    assert(diff.map(math.abs).sum == 20L, s"num delta must be 30-10, got $diff")
  }

  test("hashedFeatures: NULL feature names contribute to no slot") {
    val df = Seq((1L, Some("x"), 5L), (2L, None, 5L)).toDF("id", "cat", "v")
    val out = Features.hashedFeatures(df, $"id",
      Seq($"cat" -> lit(1L)), dim = 4).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getLong(_)).sum).toMap
    assert(math.abs(out(1L)) == 1L)
    assert(out(2L) == 0L)
  }

  test("hashedFeatures plans no shuffle (row-local projection)") {
    val df = Seq((1L, "A", 10L)).toDF("id", "cat", "v")
    val out = Features.hashedFeatures(df, $"id",
      Seq($"cat" -> lit(1L), lit("num") -> $"v"), dim = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hashing trick must not shuffle:\n$plan")
  }

  test("binaryAuc: perfect separation = 1, reversed = 0, hand AUC with ties exact") {
    def auc(rows: Seq[(Double, Boolean)]): Option[Double] = {
      val r = Features.binaryAuc(rows.toDF("s", "y"), $"s", $"y")
        .select($"auc").collect().head
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    val pos = Seq(10.0 -> true, 9.0 -> true)
    val neg = Seq(1.0 -> false, 2.0 -> false)
    assert(auc(pos ++ neg).contains(1.0))
    assert(auc(pos.map { case (s, _) => (s, false) } ++
      neg.map { case (s, _) => (s, true) }).contains(0.0))
    // hand case with a tie: scores pos {3, 2}, neg {2, 1}
    // pairs: (3>2),(3>1),(2>1) conc=3; (2,2) tie=1 -> (3 + 0.5)/4 = 0.875
    assert(auc(Seq(3.0 -> true, 2.0 -> true, 2.0 -> false, 1.0 -> false))
      .contains(0.875))
    // all ties -> 0.5 exactly
    assert(auc(Seq(5.0 -> true, 5.0 -> false, 5.0 -> true, 5.0 -> false))
      .contains(0.5))
    // degenerate single-class -> NULL
    assert(auc(Seq(1.0 -> true, 2.0 -> true)).isEmpty)
  }

  test("binaryAuc equals the naive all-pairs computation on random data") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 300).map { _ =>
      (math.floor(rng.nextDouble() * 20) / 20.0, rng.nextBoolean()) }
    val got = Features.binaryAuc(rows.toDF("s", "y"), $"s", $"y")
      .select($"auc").as[Double].head()
    val ps = rows.filter(_._2).map(_._1); val ns = rows.filterNot(_._2).map(_._1)
    val num = (for (p <- ps; n <- ns)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val want = BigDecimal(num / (ps.size.toDouble * ns.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == want, s"grouped AUC $got != all-pairs $want")
  }

  test("calibrationBins: a perfectly calibrated score has zero gaps and ECE") {
    // score s -> p=(s+1)/2; build bins where the empirical rate equals
    // the bin's constant confidence exactly
    val rows = Seq.tabulate(10) { b =>
      val p = b / 10.0 + 0.05               // bin-center confidence
      val s = 2 * p - 1
      val n = 20
      val pos = (p * n).round.toInt
      Seq.fill(pos)((s, true)) ++ Seq.fill(n - pos)((s, false))
    }.flatten
    val out = Features.calibrationBins(rows.toDF("s", "y"), $"s", $"y")
      .select($"bin", $"gap_micro", $"ece_micro").collect()
    assert(out.length == 10)
    assert(out.forall(_.getLong(2) == 0L), "ECE must be 0 when calibrated")
    assert(out.forall(_.getLong(1) == 0L), "every bin gap must be 0")
  }

  test("calibrationBins: a systematically overconfident score shows the gap") {
    // claims 90% but delivers 50%
    val rows = Seq.fill(50)((0.8, true)) ++ Seq.fill(50)((0.8, false))
    val out = Features.calibrationBins(rows.toDF("s", "y"), $"s", $"y")
      .select($"bin", $"emp_micro", $"conf_micro", $"gap_micro", $"ece_micro")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 9L)              // p = 0.9 -> top bin
    assert(r.getLong(1) == 500000L && r.getLong(2) == 900000L)
    assert(r.getLong(3) == 400000L && r.getLong(4) == 400000L)
  }

  test("bestSplit finds the planted step boundary with the exact gain") {
    // y = 0 for x < 30, y = 100 for x >= 30: perfect split at 30
    val rows = (0 until 600).map { i =>
      val x = i % 60
      (x.toDouble, if (x < 30) 0.0 else 100.0)
    }
    val r = Features.bestSplit(rows.toDF("x", "y"), $"x", $"y",
      lo = 0.0, hi = 60.0, nBins = 60).collect().head
    assert(r.getLong(0) == 29L, s"split bin ${r.getLong(0)} != 29")
    assert(r.getDouble(1) == 30.0)
    assert(r.getLong(2) == 300L && r.getLong(3) == 300L)
    // gain = SSE_parent (children are pure): N * p(1-p) * d^2 = 600*0.25*1e4
    assert(r.getLong(4) == 1500000L * 1000000L,
      s"gain_micro ${r.getLong(4)} != full parent SSE")
    assert(r.getDouble(5) == 1500000.0)
  }

  test("bestSplit matches a brute-force gain scan on random data") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 500).map(_ =>
      (rng.nextInt(20).toDouble, (rng.nextInt(1000) / 100.0)))
    val r = Features.bestSplit(rows.toDF("x", "y"), $"x", $"y",
      lo = 0.0, hi = 20.0, nBins = 20).collect().head
    // brute force over candidates — sums in exact decimal like the op,
    // differences taken in decimal BEFORE the double conversion
    def dec(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    def stats(p: Double => Boolean) = {
      val ys = rows.filter(t => p(t._1)).map(t => dec(t._2))
      (ys.size, ys.foldLeft(BigDecimal(0))(_ + _))
    }
    val (nt, sytD) = (rows.size, rows.map(t => dec(t._2))
      .foldLeft(BigDecimal(0))(_ + _))
    val best = (0 until 19).flatMap { b =>
      val (nl, sylD) = stats(_ < b + 1)
      if (nl == 0 || nl == nt) None
      else {
        val syl = sylD.toDouble; val syt = sytD.toDouble
        val syr = (sytD - sylD).toDouble
        Some((b, math.round((syl * syl / nl
          + syr * syr / (nt - nl) - syt * syt / nt) * 1e6)))
      }
    }.maxBy(t => (t._2, -t._1))
    assert(r.getLong(0) == best._1.toLong && r.getLong(4) == best._2)
  }
}
