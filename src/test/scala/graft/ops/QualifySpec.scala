package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualifySpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 30.0),
    ("b", 4, 5.0), ("b", 5, 7.0)
  ).toDF("k", "id", "v")

  test("rowNumber keeps exactly one row per key, highest v, tiebreak id") {
    val out = Qualify.rowNumber(df, Seq(col("k")), Seq(col("v").desc, col("id")))
      .select("k", "id").as[(String, Int)].collect().toSet
    assert(out == Set(("a", 2), ("b", 5)))
  }

  test("rank keeps ties (top-1-with-ties semantics of adhoc.sql:77)") {
    val out = Qualify.rank(df, Seq(col("k")), Seq(col("v").desc))
      .select("k", "id").as[(String, Int)].collect().toSet
    assert(out == Set(("a", 2), ("a", 3), ("b", 5)))
  }

  test("rowNumber(n=2) keeps top-2 per key") {
    val out = Qualify.rowNumber(df, Seq(col("k")), Seq(col("v").desc, col("id")), n = 2)
    assert(out.count() == 4)
  }

  test("dedup yields unique keys (idempotent)") {
    val once = Qualify.dedup(df, Seq(col("k")), Seq(col("id")))
    assert(once.count() == 2)
    assert(Qualify.dedup(once, Seq(col("k")), Seq(col("id"))).count() == 2)
  }

  test("dedupAgg equals window dedup on real data (all-asc total order)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"))
    val keys = Seq(col("l_orderkey"))
    val ord = Seq(col("l_linenumber"), col("l_partkey"),
      col("l_extendedprice"), col("l_quantity"))
    val viaWindow = Qualify.dedup(li, keys, ord)
    val viaAgg = Qualify.dedupAgg(li, keys, ord)
    assert(viaAgg.columns.toSeq == viaWindow.columns.toSeq)
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("dedupAgg plan is a partial-combine hash aggregate, not a sort") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    val plan = Qualify.dedupAgg(li, Seq(col("l_orderkey")), Seq(col("l_linenumber")))
      .queryExecution.executedPlan.toString
    // partial min_by below the exchange (map-side combine), no window/sort
    assert(plan.contains("partial_min_by"), s"expected partial_min_by in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
  }

  test("input with a pre-existing __rn column is not clobbered") {
    val tricky = df.withColumn("__rn", lit(99))
    val out = Qualify.rowNumber(tricky, Seq(col("k")), Seq(col("id")))
    assert(out.columns.contains("__rn"))
    assert(out.select("__rn").as[Int].collect().forall(_ == 99))
  }
}
