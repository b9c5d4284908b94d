package graft.ops

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Registry

/** Semantic pins for the binned two-sample tests and CUSUM — the
  * properties the oracle hash can't see: identical samples really
  * score zero, disjoint samples really max out, the planted level
  * shift really localizes, and the sign conventions hold. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def pts(a: Seq[Long], b: Seq[Long]) =
    (a.map((true, _)) ++ b.map((false, _))).toDF("is_a", "b")

  test("KS: identical binned samples -> D = 0, not significant") {
    val s = Seq(1L, 1L, 2L, 5L, 9L, 9L)
    val r = Stats.ksBinned(pts(s, s)).head()
    assert(r.getAs[Long]("d_num") == 0L)
    assert(r.getAs[Double]("d") == 0.0)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("KS: disjoint supports -> D = 1 at the last A bin, significant") {
    val a = (0L until 40L).map(_ % 10)         // bins 0..9
    val b = (0L until 40L).map(100L + _ % 10)  // bins 100..109
    val r = Stats.ksBinned(pts(a, b)).head()
    assert(r.getAs[Double]("d") == 1.0)
    assert(r.getAs[Long]("d_num") == 40L * 40L)
    assert(r.getAs[Long]("d_at_bin") == 9L, "first bin achieving max")
    assert(r.getAs[Boolean]("significant"))
  }

  test("KS: D matches a brute-force ECDF max on an uneven sample") {
    val a = Seq(0L, 0L, 1L, 3L, 3L, 3L, 7L)
    val b = Seq(1L, 2L, 2L, 3L, 8L, 8L)
    val r = Stats.ksBinned(pts(a, b)).head()
    val grid = (a ++ b).distinct
    val expected = grid.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.size
        - b.count(_ <= v).toDouble / b.size)
    }.max
    assert(math.abs(r.getAs[Double]("d") - expected) < 1e-6)
  }

  test("MWU: all A below all B -> U1 = 0, z negative significant") {
    val a = (0L until 30L).map(_ % 5)          // bins 0..4
    val b = (0L until 30L).map(50L + _ % 5)    // bins 50..54
    val r = Stats.mannWhitneyBinned(pts(a, b)).head()
    assert(r.getAs[Long]("u1_x2") == 0L)
    assert(r.getAs[Double]("z") < -1.96)
    assert(r.getAs[Boolean]("significant"))
  }

  test("MWU: identical samples -> U1 = n1*n2/2 exactly, z = 0") {
    val s = Seq(1L, 2L, 2L, 3L, 7L, 7L, 7L, 9L)
    val r = Stats.mannWhitneyBinned(pts(s, s)).head()
    assert(r.getAs[Long]("u1_x2") == s.size.toLong * s.size)
    assert(r.getAs[Double]("z") == 0.0)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("CUSUM: planted level shift localizes at the shift day") {
    // 10 days at 10/day then 10 days at 30/day: |S| peaks at day 10
    val daily = (1 to 20).map { t =>
      ("k", Date.valueOf(f"2024-01-$t%02d"), if (t <= 10) 10L else 30L)
    }.toDF("event_type", "day", "cnt")
    val r = Stats.cusumChangepoint(daily).head()
    assert(r.getAs[Long]("n_days") == 20L)
    assert(r.getAs[Long]("total") == 400L)
    assert(r.getAs[Date]("cp_day") == Date.valueOf("2024-01-10"))
    // at t=10: 20*100 - 10*400 = -2000
    assert(r.getAs[Long]("s_abs_max") == 2000L)
  }

  test("CUSUM: constant series -> S identically 0, earliest day reported") {
    val daily = (1 to 5).map { t =>
      ("k", Date.valueOf(f"2024-02-$t%02d"), 7L)
    }.toDF("event_type", "day", "cnt")
    val r = Stats.cusumChangepoint(daily).head()
    assert(r.getAs[Long]("s_abs_max") == 0L)
    assert(r.getAs[Date]("cp_day") == Date.valueOf("2024-02-01"))
  }

  test("anova: five groups, eta2 in [0,1], F nonnegative") {
    val r = Registry.queries("x_stat_anova")(spark, sf001).head()
    assert(r.getAs[Long]("k") == 5L)
    assert(r.getAs[Long]("n_total") > 0L)
    val eta2 = r.getAs[Double]("eta2")
    assert(eta2 >= 0.0 && eta2 <= 1.0)
    assert(r.getAs[Double]("f") >= 0.0)
  }

  test("acf: 14 lags, r in [-1,1], pair counts shrink by one per lag") {
    val rows = Registry.queries("x_ts_acf")(spark, sf001)
      .orderBy(col("lag")).collect()
    assert(rows.map(_.getAs[Int]("lag")).toSeq == (1 to 14))
    val np = rows.map(_.getAs[Long]("n_pairs"))
    assert(np.zip(np.tail).forall { case (a, b) => a == b + 1 })
    rows.foreach { r =>
      val rm = r.getAs[Long]("r_micro")
      assert(rm >= -1000000L && rm <= 1000000L)
    }
  }

  test("spearman: rho in [-1,1] on the order-size/value pair") {
    val r = Registry.queries("x_stat_spearman")(spark, sf001).head()
    val rho = r.getAs[Double]("rho")
    assert(rho >= -1.0 && rho <= 1.0)
    assert(r.getAs[Long]("n") > 0L)
  }

  test("mutual information: MI >= 0 (to rounding), bounded by min entropy") {
    val r = Registry.queries("x_ml_feature_mi")(spark, sf001).head()
    val mi = r.getAs[Long]("mi_micro")
    val hx = r.getAs[Long]("hx_micro")
    val hy = r.getAs[Long]("hy_micro")
    assert(mi >= -10L, s"MI can dip below 0 only by term rounding: $mi")
    assert(mi <= math.min(hx, hy) + 10L)
    assert(hx > 0L && hy > 0L)
    val nmi = r.getAs[Double]("nmi")
    assert(nmi >= -1e-5 && nmi <= 1.0 + 1e-5)
  }

  test("ref integrity: clean TPC-H FKs have zero orphans, events may not") {
    val rows = Registry.queries("x_dq_ref_integrity")(spark, sf001)
      .collect().map(r => r.getAs[String]("relation") -> r).toMap
    assert(rows.size == 5)
    assert(rows("lineitem.orderkey->orders").getAs[Long]("n_orphan") == 0L)
    assert(rows("orders.custkey->customer").getAs[Long]("n_orphan") == 0L)
    rows.values.foreach { r =>
      val ppm = r.getAs[Long]("orphan_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
    }
  }
}
