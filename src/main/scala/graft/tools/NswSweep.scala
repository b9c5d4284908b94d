package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Similarity

/** Dev-only parameter sweep for the NSW beam search: prints recall@5
  * vs brute force for a grid of (m, beam, rounds) configs. Not part of
  * the driver contract; run by hand while tuning the registered
  * defaults. */
object NswSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    val truth = Similarity
      .bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(true)
    for {
      p <- Seq(1, 2, 3)
      m <- Seq(8, 12, 16)
      beam <- Seq(16, 24)
      rounds <- Seq(3, 4)
    } {
      val t0 = System.nanoTime()
      val got = Similarity.nswTopK(emb.filter(col("vec_id") < 10), emb,
          k = 5, centroids = emb.filter(col("vec_id") % 97 === 0)
            .orderBy(col("vec_id")).limit(128),
          m = m, beamWidth = beam, rounds = rounds, cellsPerNode = p)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      val row = truth.join(got, Seq("query_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("n"), count(col("hit")).as("h"))
        .collect()(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"p=$p%d m=$m%2d beam=$beam%2d rounds=$rounds%d  recall=" +
        f"${row.getLong(1).toDouble / row.getLong(0)}%.3f  ${dt}%.1fs")
    }
    spark.stop()
  }
}
