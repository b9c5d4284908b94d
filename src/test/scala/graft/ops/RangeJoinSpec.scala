package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, -7.5), (2L, -5.0), (3L, 0.0), (4L, 2.49), (5L, 2.5),
    (6L, 9.99), (7L, 10.0), (8L, 37.2), (9L, 100.0))
    .toDF("p_id", "v")

  private def intervals = Seq(
    (10L, -10.0, -5.0),  // negative range; hi lands on a bin edge
    (11L, 0.0, 2.5),     // hi exclusive at 2.5
    (12L, 2.5, 10.0),    // adjacent interval, shares the 2.5 boundary
    (13L, 5.0, 40.0),    // wide interval spanning many bins
    (14L, 50.0, 50.0),   // empty interval matches nothing
    (15L, 60.0, 55.0))   // inverted interval matches nothing
    .toDF("i_id", "lo", "hi")

  private def naive = points.join(intervals,
    col("v") >= col("lo") && col("v") < col("hi"))

  test("binned range join equals the naive theta join at several bin widths") {
    val expect = naive.select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(expect.nonEmpty) // the fixture actually exercises matches
    for (w <- Seq(0.7, 2.5, 5.0, 100.0)) {
      val got = RangeJoin
        .binnedPointIntervalJoin(points, col("v"), intervals, col("lo"), col("hi"), w)
        .select("p_id", "i_id").as[(Long, Long)].collect().toSet
      assert(got == expect, s"binWidth=$w")
    }
  }

  test("half-open semantics: hi is exclusive, lo inclusive, empty/inverted drop") {
    val got = RangeJoin
      .binnedPointIntervalJoin(points, col("v"), intervals, col("lo"), col("hi"), 2.5)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(got.contains((5L, 12L)) && !got.contains((5L, 11L))) // v=2.5 boundary
    assert(got.contains((3L, 11L)))                             // v=0.0 == lo: inclusive
    assert(!got.contains((2L, 10L)))                            // v=-5.0 == hi: exclusive
    assert(!got.exists(_._2 == 14L) && !got.exists(_._2 == 15L))
  }

  test("NULL points and bounds never match") {
    val p = Seq((1L, Some(1.0)), (2L, None)).toDF("p_id", "v")
    val i = Seq((10L, Some(0.0), Some(2.0)), (11L, None, Some(2.0)))
      .toDF("i_id", "lo", "hi")
    val got = RangeJoin
      .binnedPointIntervalJoin(p, col("v"), i, col("lo"), col("hi"), 1.0)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  test("plans as an equi-join, not a nested-loop join") {
    val plan = RangeJoin
      .binnedPointIntervalJoin(points, col("v"), intervals, col("lo"), col("hi"), 2.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("rejects overlapping column names and bad bin widths") {
    val i2 = intervals.withColumnRenamed("i_id", "p_id")
    intercept[IllegalArgumentException] {
      RangeJoin.binnedPointIntervalJoin(points, col("v"), i2, col("lo"), col("hi"), 1.0)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.binnedPointIntervalJoin(points, col("v"), intervals, col("lo"), col("hi"), 0.0)
    }
  }
}
