package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Graph, Qualify}

/** Dev-only round-floor experiment (round-8 verdict ask #7): the graph
  * tier's fixed-point queries pay a per-round action floor (each round
  * localCheckpoints). This measures, on the exact query-shaped graph
  * (the bipartite customer–supplier order graph at a given SF):
  *
  *   - labelprop: per-round checkpoint (shipped) vs NO intermediate
  *     checkpoint (the per-round label frame has exactly ONE consumer —
  *     the next round — so skipping materialization recomputes
  *     nothing; the rounds chain into one multi-stage action)
  *   - pageRankConverged: per-round convergence head() (shipped) vs
  *     checking only every 2nd round (over-running past the fixed
  *     point is the identity, so results are bit-identical)
  *
  * Adoption rule from the verdict: rewire the operators if ≥1.3×.
  */
object GraphUnroll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val edges = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
      .localCheckpoint(true)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"  $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }

    /** labelPropagation body with a checkpoint-cadence knob. */
    def labelProp(rounds: Int, ckptEvery: Int): DataFrame = {
      val sym = edges.select(col("src"), col("dst"))
        .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .localCheckpoint(true)
      var labels = sym.select(col("src").as("node")).distinct()
        .withColumn("label", col("node"))
      for (r <- 1 to rounds) {
        val counted = sym
          .join(labels, sym("src") === labels("node"))
          .select(sym("dst").as("node"), col("label"))
          .groupBy(col("node"), col("label")).agg(count(lit(1)).as("c"))
        labels = Qualify.rowNumber(counted,
          Seq(col("node")), Seq(col("c").desc, col("label").asc), n = 1)
          .select(col("node"), col("label"))
        if (r % ckptEvery == 0 && r < rounds) labels = labels.localCheckpoint()
      }
      labels
    }

    for (pass <- Seq("warmup", "timed")) {
      println(s"$pass:")
      timed("labelprop ckpt=1 (ship)") { noop(labelProp(3, 1)) }
      timed("labelprop ckpt=2") { noop(labelProp(3, 2)) }
      timed("labelprop no-ckpt") { noop(labelProp(3, 99)) }
      timed("labelprop r5 ckpt=1") { noop(labelProp(5, 1)) }
      timed("labelprop r5 no-ckpt") { noop(labelProp(5, 99)) }
      timed("pagerank conv (ship)") {
        noop(Graph.pageRankConverged(edges, maxIters = 3)._1) }
      timed("pagerank fixed") {
        noop(Graph.pageRankFixedPoint(edges, iters = 3)) }
    }
    spark.stop()
  }
}
