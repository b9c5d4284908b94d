package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Dev-only per-stage wall breakdown of x_graph_betweenness at sf0.1:
  * times each eager materialization (edge build, forward rounds,
  * backward rounds, final rollup) separately so optimization effort
  * lands where the seconds are.
  */
object BetweennessProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    val d = sfDir

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    def once(): Unit = {
      val eraw = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      val edges = timed("edges checkpoint") {
        eraw.select(col("a").as("src"), col("b").as("dst"))
          .unionByName(eraw.select(col("b").as("src"), col("a").as("dst")))
          .repartition(col("src"))
          .sortWithinPartitions(col("src"))
          .localCheckpoint(true)
      }
      val maxDepth = 3
      var levels = Vector(
        Tables.customer(s, d).filter(col("c_custkey") <= 4)
          .select((col("c_custkey") * 2).as("seed"))
          .withColumn("node", col("seed"))
          .withColumn("sigma", lit(1L)))
      var visited = levels(0).select(col("seed"), col("node"))
      for (k <- 1 to maxDepth) {
        val plan = levels(k - 1)
          .join(edges, col("node") === col("src"))
          .groupBy(col("seed"), col("dst"))
          .agg(sum(col("sigma")).as("sigma"))
          .withColumnRenamed("dst", "node")
          .join(visited, Seq("seed", "node"), "left_anti")
        if (sys.env.contains("EXPLAIN") && k == 2)
          plan.explain("formatted")
        val next = timed(s"forward round $k") {
          plan.localCheckpoint(true)
        }
        levels = levels :+ next
        visited = visited.unionByName(next.select(col("seed"), col("node")))
      }
      var deltas = Vector(
        levels(maxDepth).select(col("seed"), col("node"), col("sigma"),
          lit(0L).as("delta_micro")))
      for (k <- (maxDepth - 1) to 1 by -1) {
        val down = deltas.head
          .select(col("seed").as("__wseed"), col("node").as("__w"),
            col("sigma").as("__sw"), col("delta_micro").as("__dw"))
        val sums = levels(k)
          .join(edges, col("node") === col("src"))
          .join(down, col("seed") === col("__wseed")
            && col("dst") === col("__w"))
          .select(col("seed"), col("node"),
            expr("sigma * (1000000 + __dw) DIV __sw").as("term"))
          .groupBy(col("seed"), col("node"))
          .agg(sum(col("term")).as("delta_sum"))
        val dk0 = levels(k).select(col("seed"), col("node"), col("sigma"))
          .join(sums, Seq("seed", "node"), "left")
          .select(col("seed"), col("node"), col("sigma"),
            coalesce(col("delta_sum"), lit(0L)).as("delta_micro"))
        val dk = if (k > 1) timed(s"backward round $k") {
          dk0.localCheckpoint(true)
        } else dk0
        deltas = dk +: deltas
      }
      val all = deltas
        .map(_.select(col("seed"), col("node"), col("delta_micro")))
        .reduce(_ unionByName _)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("betweenness_micro").desc, col("node"))
      val out = all.groupBy(col("node"))
        .agg(sum(col("delta_micro")).as("betweenness_micro"),
          count(lit(1)).as("n_seeds_reaching"))
        .orderBy(col("betweenness_micro").desc, col("node"))
        .limit(20)
        .withColumn("rank", row_number().over(w).cast("int"))
        .withColumn("node_type",
          when(col("node") % 2 === 0, "customer").otherwise("supplier"))
      timed("final rollup") { out.write.format("noop").mode("overwrite").save() }
    }
    println("warmup:")
    once()
    println("timed:")
    once()
    spark.stop()
  }
}
