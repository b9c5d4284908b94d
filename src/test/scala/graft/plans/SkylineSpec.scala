package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def sky(rows: Seq[(Long, Double, Double)]) =
    Skyline.of(rows.toDF("id", "x", "y"), Seq("x", "y"))
      .select($"id").as[Long].collect().toSet

  test("hand case: dominated rows removed, frontier kept") {
    // (3,3) dominates (1,1),(2,2),(3,1); (1,4) and (4,1) survive as
    // tradeoffs; (3,3) itself survives
    val rows = Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0), (3L, 3.0, 3.0),
      (4L, 3.0, 1.0), (5L, 1.0, 4.0), (6L, 4.0, 1.0))
    assert(sky(rows) == Set(3L, 5L, 6L))
  }

  test("equal rows do not dominate each other; both kept") {
    val rows = Seq((1L, 2.0, 2.0), (2L, 2.0, 2.0), (3L, 1.0, 1.0))
    assert(sky(rows) == Set(1L, 2L))
  }

  test("ties on one dimension: strict improvement on the other decides") {
    // (2,5) vs (2,3): same x, higher y dominates
    val rows = Seq((1L, 2.0, 5.0), (2L, 2.0, 3.0))
    assert(sky(rows) == Set(1L))
  }

  test("partitioning-independent and equals the NOT EXISTS formulation (real data)") {
    val p = graft.core.Tables.part(spark, sf001)
      .select($"p_partkey", $"p_retailprice".cast("double").as("x"),
        $"p_size".cast("long").as("y"))
    val a = Skyline.of(p, Seq("x", "y"))
      .select($"p_partkey").as[Long].collect().toSet
    val b = Skyline.of(p.repartition(13), Seq("x", "y"))
      .select($"p_partkey").as[Long].collect().toSet
    assert(a == b, "skyline must not depend on partitioning")
    // NOT EXISTS reference on the same frame
    p.createOrReplaceTempView("sky_parts")
    val ref = spark.sql("""
      SELECT p_partkey FROM sky_parts a WHERE NOT EXISTS (
        SELECT 1 FROM sky_parts b
        WHERE b.x >= a.x AND b.y >= a.y AND (b.x > a.x OR b.y > a.y))""")
      .as[Long].collect().toSet
    assert(a == ref)
  }

  test("three dimensions; NULL dims never survive a dominator") {
    val df = Seq(
      (1L, Some(3.0), 3.0, 3.0), (2L, Some(1.0), 5.0, 1.0),
      (3L, None, 9.0, 9.0), (4L, Some(0.5), 9.0, 9.0))
      .toDF("id", "x", "y", "z")
    val out = Skyline.of(df, Seq("x", "y", "z"))
      .select($"id").as[Long].collect().toSet
    // row 3's NULL x reads as -inf: dominated by row 4; rows 1, 2, 4 are tradeoffs
    assert(out == Set(1L, 2L, 4L))
  }

  test("physical plan contains SkylineExec and no join") {
    val df = Seq((1L, 1.0, 1.0)).toDF("id", "x", "y")
    val plan = Skyline.of(df, Seq("x", "y"))
      .queryExecution.executedPlan
    assert(plan.collectFirst { case e: SkylineExec => e }.isDefined,
      s"SkylineExec missing:\n$plan")
    assert(plan.collectFirst {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }.isEmpty,
      "skyline must not plan a self-join")
  }

  test("filter pushdown: >= on a dimension relocates below SkylineExec, result identical") {
    val df = (1L to 200L).map(i => (i, (i % 37).toDouble, (i % 11).toDouble))
      .toDF("id", "x", "y")
    val sky = Skyline.of(df, Seq("x", "y"))
    val filtered = sky.filter($"x" >= 30.0)
    // plan shape: the Filter must sit BELOW SkylineExec
    val plan = filtered.queryExecution.executedPlan
    val skyNode = plan.collectFirst { case e: SkylineExec => e }.get
    assert(skyNode.collectFirst {
      case f: org.apache.spark.sql.execution.FilterExec => f }.isDefined,
      s"filter not pushed below skyline:\n$plan")
    assert(plan.collectFirst {
      case f: org.apache.spark.sql.execution.FilterExec
        if !skyNode.exists(_ eq f) => f }.isEmpty,
      s"pushed filter left a residual above:\n$plan")
    // result: equals frontier-then-filter computed WITHOUT the rule
    val expect = sky.collect().map(_.getLong(0)).toSet
      .intersect(df.filter($"x" >= 30.0).select($"id").as[Long].collect().toSet)
    assert(filtered.select($"id").as[Long].collect().toSet == expect)
  }

  test("filter pushdown: upper bounds and non-dimension predicates stay above") {
    val df = (1L to 50L).map(i => (i, i.toDouble, (i % 7).toDouble))
      .toDF("id", "x", "y")
    val sky = Skyline.of(df, Seq("x", "y"))
    // x <= c does NOT commute (it can delete a dominator); id is not a dim
    Seq(sky.filter($"x" <= 40.0), sky.filter($"id" < 10L)).foreach { q =>
      val plan = q.queryExecution.executedPlan
      val skyNode = plan.collectFirst { case e: SkylineExec => e }.get
      assert(skyNode.collectFirst {
        case f: org.apache.spark.sql.execution.FilterExec => f }.isEmpty,
        s"non-commuting filter wrongly pushed:\n$plan")
    }
    // and the semantics stand: x <= 40 filters the FULL frontier
    val full = sky.collect().map(_.getLong(0)).toSet
    val out = sky.filter($"x" <= 40.0).select($"id").as[Long].collect().toSet
    assert(out == full.filter(_ <= 40L))
  }

  test("rejects non-numeric dimensions loudly") {
    val df = Seq((1L, "a")).toDF("id", "s")
    val ex = intercept[Exception] {
      Skyline.of(df, Seq("s")).collect()
    }
    assert(ex.getMessage.contains("skyline dimensions"), ex.getMessage)
  }
}
