package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KpisSpec extends SparkSpec {
  import spark.implicits._

  test("lagPctChange: previous ROW not previous month — gaps are not filled (SURVEY §7.5.3)") {
    // months 1, 2, 4 (gap at 3): pct for month 4 must compare against month 2
    val df = Seq(("x", 2020, 1, 100L), ("x", 2020, 2, 150L), ("x", 2020, 4, 75L))
      .toDF("g", "y", "m", "cnt")
    val out = Kpis.lagPctChange(df, Seq("g"), Seq("y", "m"), "cnt", "pct")
      .orderBy("m").select("pct").as[Option[Double]].collect()
    assert(out(0).isEmpty)                       // first row: no previous
    assert(out(1).contains(50.0))                // 100 -> 150
    assert(out(2).contains(-50.0))               // 150 -> 75 (vs row, not month 3)
  }

  test("fullOuterOfAggs covers the union of keys with nulls off-side") {
    val a = Seq(("k1", 1L), ("k2", 2L)).toDF("k", "ca")
    val b = Seq(("k2", 20L), ("k3", 30L)).toDF("k", "cb")
    val out = Kpis.fullOuterOfAggs(Seq("k"), Seq(a, b))
    assert(out.select("k").as[String].collect().toSet == Set("k1", "k2", "k3"))
    val k1 = out.filter($"k" === "k1").select("cb").as[Option[Long]].head()
    assert(k1.isEmpty)
  }

  test("globalBestWorst equals the global-window form on real data, without a global window") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val viaAgg = Kpis.globalBestWorst(orders, "o_totalprice", "o_orderkey")
    val wBest = org.apache.spark.sql.expressions.Window
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wWorst = org.apache.spark.sql.expressions.Window
      .orderBy(col("o_totalprice").asc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rk_best", row_number().over(wBest))
      .withColumn("rk_worst", row_number().over(wWorst))
      .filter(col("rk_best") === 1 || col("rk_worst") === 1)
    assert(viaAgg.columns.toSeq == viaWindow.columns.toSeq)
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
    assert(!viaAgg.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("globalBestWorst collapses the single-row (best == worst) case to one row") {
    val one = Seq((7L, 1L, 42.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val out = Kpis.globalBestWorst(one, "o_totalprice", "o_orderkey")
    assert(out.count() == 1)
    val r = out.head()
    assert(r.getAs[Int]("rk_best") == 1 && r.getAs[Int]("rk_worst") == 1)
  }

  test("fullOuterOfAggsOnePass equals the join-of-aggregates form on real data, one shuffle, no join") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val keys = Seq(col("o_orderpriority").as("priority"))
    // includes a SPARSE arm (matches ~no groups) so the null-out /
    // dropped-group paths are exercised against the join semantics
    val preds = Seq(
      None,
      Some(col("o_orderstatus") === "O"),
      Some(col("o_totalprice") > 550000.0))
    val arms = preds.zipWithIndex.map { case (p, i) =>
      Kpis.AggArm(p, s"ct_$i", Seq(s"sum_$i" -> col("o_totalprice")))
    }
    val viaJoin = Kpis.fullOuterOfAggs(
      Seq("priority"),
      preds.zipWithIndex.map { case (p, i) =>
        p.fold(orders)(orders.filter)
          .groupBy(keys: _*)
          .agg(count(lit(1)).as(s"ct_$i"),
            graft.core.Exact.sumMoney(col("o_totalprice")).as(s"sum_$i"))
      })
    val viaOnePass = Kpis.fullOuterOfAggsOnePass(orders, keys, arms)
    assert(viaOnePass.columns.toSeq == viaJoin.columns.toSeq)
    assert(viaOnePass.schema == viaJoin.schema)
    assert(viaOnePass.exceptAll(viaJoin).isEmpty && viaJoin.exceptAll(viaOnePass).isEmpty)
    val plan = viaOnePass.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in one-pass plan:\n$plan")
    assert(plan.split("Exchange").length - 1 == 1,
      s"expected exactly one shuffle, got:\n$plan")
  }

  test("fullOuterOfAggsOnePassArms with median/countDistinct arms equals the join form") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val keys = Seq(col("o_orderpriority").as("priority"))
    val viaJoin = Kpis.fullOuterOfAggs(
      Seq("priority"),
      Seq(
        orders.groupBy(keys: _*).agg(
          count(lit(1)).as("n"), countDistinct(col("o_custkey")).as("n_cust"),
          median(col("o_totalprice")).as("med")),
        orders.filter(col("o_orderstatus") === "O").groupBy(keys: _*).agg(
          countDistinct(col("o_custkey")).as("n_open_cust")),
        // sparse arm: exercises the unmatched-side null columns
        orders.filter(col("o_totalprice") > 550000.0).groupBy(keys: _*).agg(
          count(lit(1)).as("n_big"), median(col("o_totalprice")).as("med_big"))))
    val viaOnePass = Kpis.fullOuterOfAggsOnePassArms(
      orders, keys,
      Seq(
        Kpis.Arm(None, m => Seq(
          "n" -> count(m(lit(1))), "n_cust" -> countDistinct(m(col("o_custkey"))),
          "med" -> median(m(col("o_totalprice")))),
          zeroWhenEmpty = Set("n", "n_cust")),
        Kpis.Arm(Some(col("o_orderstatus") === "O"), m => Seq(
          "n_open_cust" -> countDistinct(m(col("o_custkey")))),
          zeroWhenEmpty = Set("n_open_cust")),
        Kpis.Arm(Some(col("o_totalprice") > 550000.0), m => Seq(
          "n_big" -> count(m(lit(1))), "med_big" -> median(m(col("o_totalprice")))),
          zeroWhenEmpty = Set("n_big"))))
    assert(viaOnePass.columns.toSeq == viaJoin.columns.toSeq)
    assert(viaOnePass.exceptAll(viaJoin).isEmpty && viaJoin.exceptAll(viaOnePass).isEmpty)
    val plan = viaOnePass.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in one-pass plan:\n$plan")
  }

  test("NULL grouping keys: one-pass reproduces the join's per-arm split exactly") {
    val df = Seq((Option.empty[String], 1.0), (None, 100.0), (Some("k"), 5.0))
      .toDF("k", "v")
    def arm(p: Option[org.apache.spark.sql.Column], n: String) = p match {
      case Some(pred) => df.filter(pred).groupBy(col("k")).agg(count(lit(1)).as(n))
      case None => df.groupBy(col("k")).agg(count(lit(1)).as(n))
    }
    val viaJoin = Kpis.fullOuterOfAggs(Seq("k"),
      Seq(arm(None, "n_all"), arm(Some(col("v") > 50.0), "n_big")))
    val viaOnePass = Kpis.fullOuterOfAggsOnePass(df, Seq(col("k")),
      Seq(Kpis.AggArm(None, "n_all", Nil),
        Kpis.AggArm(Some(col("v") > 50.0), "n_big", Nil)))
    // SQL equality never matches NULL, so the join emits the NULL group
    // once per matched arm (2 rows, each with the other arm's column
    // null); the one-pass form must split identically
    assert(viaJoin.filter(col("k").isNull).count() == 2)
    assert(viaOnePass.columns.toSeq == viaJoin.columns.toSeq)
    assert(viaOnePass.exceptAll(viaJoin).isEmpty && viaJoin.exceptAll(viaOnePass).isEmpty)
    // still no join in the physical plan — the split happens post-agg
    val plan = viaOnePass.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in one-pass plan:\n$plan")
  }

  test("partially-NULL key tuples split per-arm; arms empty for the group emit no row") {
    // key = (k1, k2): NULL in ANY key component defeats join equality.
    // Group (null, 2020): arm1 has rows, arm2 does not -> exactly one
    // row (arm1's), not two. Group (a, 2020): fully non-null -> merged.
    val df = Seq(
      (Option.empty[String], 2020, 10.0),
      (None, 2020, 20.0),
      (Some("a"), 2020, 100.0))
      .toDF("k1", "k2", "v")
    def arm(p: Option[org.apache.spark.sql.Column], n: String) = {
      val base = p.fold(df)(df.filter)
      base.groupBy(col("k1"), col("k2")).agg(count(lit(1)).as(n))
    }
    val viaJoin = Kpis.fullOuterOfAggs(Seq("k1", "k2"),
      Seq(arm(None, "n_all"), arm(Some(col("v") > 50.0), "n_big")))
    val viaOnePass = Kpis.fullOuterOfAggsOnePass(df, Seq(col("k1"), col("k2")),
      Seq(Kpis.AggArm(None, "n_all", Nil),
        Kpis.AggArm(Some(col("v") > 50.0), "n_big", Nil)))
    assert(viaJoin.filter(col("k1").isNull).count() == 1) // arm2 empty there
    assert(viaOnePass.exceptAll(viaJoin).isEmpty && viaJoin.exceptAll(viaOnePass).isEmpty)
  }

  test("fullOuterOfAggsOnePass drops groups matched by no arm (all arms filtered)") {
    val df = Seq(("a", 1.0), ("b", 100.0)).toDF("k", "v")
    val out = Kpis.fullOuterOfAggsOnePass(df, Seq(col("k")),
      Seq(Kpis.AggArm(Some(col("v") > 50.0), "ct", Seq("s" -> col("v")))))
    val rows = out.collect()
    assert(rows.length == 1 && rows.head.getString(0) == "b")
  }

  test("conditionalCounts = one-pass rewrite of repeated scalar-subquery counts (adhoc.sql:183-187)") {
    val df = Seq(1, 2, 3, 4, 5, 6).toDF("v")
    val out = Kpis.conditionalCounts(df, Map(
      "n_even" -> ($"v" % 2 === 0), "n_big" -> ($"v" > 4))).head()
    assert(out.getAs[Long]("n_even") == 3L)
    assert(out.getAs[Long]("n_big") == 2L)
  }

  test("conditionalCounts on EMPTY input yields 0s like scalar-subquery COUNT(*), not nulls") {
    val empty = Seq.empty[Int].toDF("v")
    val out = Kpis.conditionalCounts(empty, Map(
      "n_total" -> lit(true), "n_big" -> ($"v" > 4))).head()
    assert(out.getAs[Long]("n_total") == 0L)
    assert(out.getAs[Long]("n_big") == 0L)
  }
}
