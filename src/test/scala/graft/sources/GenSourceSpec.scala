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

  test("ungrouped count/min/max push COMPLETELY into the source (no rows generated)") {
    val df = gen(1000000).filter($"id" >= 100L && $"id" < 900000L)
      .agg(count(lit(1)).as("c"), min($"id").as("mn"), max($"id").as("mx"))
    val row = df.collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      ((899900L, 100L, 899999L)))
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan }
    assert(scans.nonEmpty)
    val agg = scans.collect { case a: GenAggScan => a }
    assert(agg.nonEmpty,
      s"aggregate not pushed; scans were ${scans.map(_.description()).mkString}")
    // the pushed scan plans exactly one O(1) partition — a metadata
    // answer, not a 900k-row generate-and-count
    assert(agg.head.planInputPartitions().length == 1)
    assert(agg.head.description().contains("aggPushed="))
  }

  test("pushed aggregate over an empty interval: count 0, null min/max") {
    val df = gen(1000).filter($"id" >= 5000L)
      .agg(count(lit(1)).as("c"), min($"id").as("mn"), max($"id").as("mx"))
    val row = df.collect().head
    assert(row.getLong(0) == 0L)
    assert(row.isNullAt(1) && row.isNullAt(2))
    assert(df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan }.collectFirst {
      case a: GenAggScan => a }.nonEmpty)
  }

  test("grouped or non-id aggregates are NOT pushed and stay correct") {
    // group-by defeats the complete pushdown -> ordinary GenScan path
    val g = gen(1000).groupBy($"bucket").agg(count(lit(1)).as("c"))
    assert(g.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan }.collectFirst {
      case a: GenAggScan => a }.isEmpty)
    assert(g.count() == 97)
    // count(distinct) likewise falls back and computes correctly
    val dAgg = gen(1000).agg(countDistinct($"bucket").as("d")).collect().head
    assert(dAgg.getLong(0) == 97L)
  }

  test("LIMIT pushes completely: the scan generates exactly N head rows") {
    val df = spark.read.format("graftgen")
      .option("rows", "100000").option("parts", "8").load()
      .filter($"id" >= 500)
      .limit(5)
    val rows = df.collect()
    // complete pushdown contract: the interval HEAD, deterministically
    assert(rows.map(_.getLong(0)).sorted.toSeq == (500L to 504L))
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("pushedIdRange=[500,505)"),
      s"limit must truncate the pushed interval:\n$scanDesc")
  }

  test("ORDER BY id DESC LIMIT N pushes as top-N: scan reads the interval tail") {
    val df = spark.read.format("graftgen")
      .option("rows", "100000").option("parts", "8").load()
      .filter($"id" < 90000)
      .orderBy($"id".desc).limit(4)
    val got = df.select($"id").as[Long].collect().toSeq
    assert(got == Seq(89999L, 89998L, 89997L, 89996L),
      "partial topN keeps Spark's sort, so output order is exact")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("pushedIdRange=[89996,90000)"),
      s"topN desc must truncate to the interval tail:\n$scanDesc")
  }

  test("top-N on a non-id sort is refused and stays correct") {
    val df = spark.read.format("graftgen")
      .option("rows", "1000").option("parts", "4").load()
      .orderBy($"bucket".desc, $"id").limit(3)
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("pushedIdRange=[0,1000)"),
      s"non-id sort must scan the full interval:\n$scanDesc")
    // correctness: bucket = id % 97, max bucket 96 first at id 96
    assert(df.select($"id").as[Long].collect().toSeq == Seq(96L, 193L, 290L))
  }
}
