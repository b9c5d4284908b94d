package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit9 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.Registry.queries("q_pipeline_kpi_property_type")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // pruning check: does the staging window carry all 74 columns or
    // only what the KPI needs?
    println("— window operators (dedup) —")
    plan.linesIterator.filter(_.contains("Window")).foreach(l => println(l.take(400)))
    println("— exchanges —")
    plan.linesIterator.filter(_.contains("Exchange")).foreach(l => println(l.take(160)))
    println("— broadcast joins: " + plan.linesIterator.count(_.contains("BroadcastHashJoin")))
    println("— sort-merge joins: " + plan.linesIterator.count(_.contains("SortMergeJoin")))
    println("— scans —")
    plan.linesIterator.filter(_.contains("ReadSchema")).foreach(l => println(l.take(220)))
    spark.stop()
  }
}
