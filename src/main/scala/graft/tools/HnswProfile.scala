package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Similarity

/** Dev-only wall breakdown of hnswTopK vs nswTopK at a given SF dir —
  * times the flat query and the hierarchical query side by side
  * (warmup + timed, Bench methodology) so layer-cost regressions are
  * attributable. */
object HnswProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    def cents = emb.filter(col("vec_id") % 97 === 0)
      .orderBy(col("vec_id")).limit(128)
    def q = emb.filter(col("vec_id") < 10)

    // job-time accounting: wall >> sum(job walls) means the driver
    // (planning/broadcast collect) dominates, not executor work
    val jobMs = new java.util.concurrent.atomic.AtomicLong()
    val jobN = new java.util.concurrent.atomic.AtomicLong()
    // boxed Long: remove() must return null (not unbox to 0) when a
    // job-start event was dropped by the listener bus
    val jobStart =
      new java.util.concurrent.ConcurrentHashMap[Integer, java.lang.Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStart.put(e.jobId, e.time)
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = jobStart.remove(e.jobId)
          if (s != null) { jobMs.addAndGet(e.time - s); jobN.incrementAndGet() }
        }
      })
    def timed(label: String)(f: => Unit): Unit = {
      jobMs.set(0); jobN.set(0)
      val t0 = System.nanoTime()
      f
      Thread.sleep(300) // let the listener bus drain
      println(f"  $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2fs" +
        f"  jobs=${jobN.get}%3d  jobWall=${jobMs.get / 1e3}%6.2fs")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (pass <- Seq("warmup", "timed")) {
      println(s"$pass:")
      timed("nsw") { noop(Similarity.nswTopK(q, emb, k = 5,
        centroids = cents, m = 12, beamWidth = 24, rounds = 4,
        cellsPerNode = 2)) }
      timed("hnsw") { noop(Similarity.hnswTopK(q, emb, k = 5,
        centroids = cents, m = 12, beamWidth = 24, upperRounds = 2,
        lowerRounds = 3, cellsPerNode = 2, layerMod = 16,
        entryFactor = 8)) }
      timed("hnsw upper=1") { noop(Similarity.hnswTopK(q, emb, k = 5,
        centroids = cents, m = 12, beamWidth = 24, upperRounds = 1,
        lowerRounds = 3, cellsPerNode = 2, layerMod = 16,
        entryFactor = 8)) }
    }
    spark.stop()
  }
}
