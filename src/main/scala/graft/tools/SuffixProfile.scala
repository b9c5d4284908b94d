package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Dedup

/** Dev-only wall timing for suffixSpans at sf0.1 (min-of-2 after a
  * warmup, the Bench methodology). */
object SuffixProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    def once(): Double = {
      val t0 = System.nanoTime()
      Dedup.suffixSpans(docs, col("doc_id"), col("text")).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"warmup: ${once()}%.2fs")
    println(f"timed:  ${Seq(once(), once()).min}%.2fs")
    spark.stop()
  }
}
