package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, IsNotNull, LessThan}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec

class GenSourceSpec extends SparkSpec {
  import spark.implicits._

  private def gen(rows: Long, parts: Int = 8) =
    spark.read.format("graftgen")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  test("short name resolves via DataSourceRegister; full scan is correct") {
    val df = gen(500)
    assert(df.count() == 500)
    val r = df.filter($"id" === 193L)
      .select($"bucket", $"payload").as[(Int, String)].head()
    assert(r._1 == (193 % 97))
    assert(r._2 == GenSource.md5hex("193"))
    // payload agrees with Spark's own md5 (the oracle contract)
    val cross = gen(50).select($"payload",
      md5($"id".cast("string")).as("expect"))
      .filter($"payload" =!= $"expect")
    assert(cross.isEmpty)
  }

  test("id range filters are pushed and consumed; partitions pruned") {
    val df = gen(1000, parts = 10).filter($"id" >= 300L && $"id" < 500L)
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }
    assert(scans.size == 1)
    val scan = scans.head.scan.asInstanceOf[GenScan]
    assert(scan.description().contains("pushedIdRange=[300,500)"),
      scan.description())
    // 10 slices of 100 ids; [300,500) intersects exactly slices 3 and 4
    assert(scan.planInputPartitions().length == 2)
    assert(df.count() == 200)
    // the consumed range must not reappear as a post-scan Filter
    val postFilters = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f }
    assert(postFilters.isEmpty,
      s"pushed filters re-evaluated: ${postFilters.map(_.condition)}")
  }

  test("non-id predicates stay residual and still apply") {
    val df = gen(1000).filter($"bucket" === 3)
    val out = df.select($"id").as[Long].collect()
    assert(out.nonEmpty && out.forall(_ % 97 == 3))
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }.head.scan.asInstanceOf[GenScan]
    // no id bounds pushed: full range stays
    assert(scan.description().contains("pushedIdRange=[0,1000)"))
  }

  test("column pruning reaches the reader schema") {
    val df = gen(100).select($"bucket")
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }.head.scan.asInstanceOf[GenScan]
    assert(scan.readSchema().fieldNames.toSeq == Seq("bucket"),
      scan.readSchema().treeString)
    assert(df.as[Int].collect().sum == (0L until 100L).map(_ % 97).sum)
  }

  test("scan builder unit contract: bounds fold, residuals returned") {
    val b = new GenScanBuilder(rows = 1000, parts = 4)
    val residual = b.pushFilters(Array(
      GreaterThanOrEqual("id", 100L), LessThan("id", 150L), IsNotNull("id")))
    assert(residual.toSeq == Seq(IsNotNull("id")))
    assert(b.pushedFilters().length == 2)
    b.pruneColumns(StructType(Seq(StructField("id", LongType, false))))
    val scan = b.build().asInstanceOf[GenScan]
    val parts = scan.planInputPartitions().map(_.asInstanceOf[GenPartition])
    assert(parts.toSeq == Seq(GenPartition(100, 150)))
  }

  test("empty pushed range plans zero partitions") {
    val df = gen(1000).filter($"id" >= 2000L)
    assert(df.isEmpty)
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }.head.scan.asInstanceOf[GenScan]
    assert(scan.planInputPartitions().isEmpty)
  }
}
