package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's operational REFRESH loop (populate.py:65–68: the
  * Airflow DAG re-runs monthly as new scrape files land) as an
  * INCREMENTAL fact maintenance pass: each tick discovers unprocessed
  * `*listings*.csv` files, runs ONLY those through the real staging →
  * fact path, and commits their months into the partitioned fact —
  * leaving every already-built month untouched.
  *
  * Why this is exactly equivalent to a full rebuild (the spec asserts
  * it month by month): the pipeline is FILE-LOCAL by construction —
  * the staging dedup key is (id, filename) (design.sql:265–266), the
  * fact's month columns derive from the filename, and the location /
  * census dims are static side files — so a fact row depends on its
  * source file and the dims, never on another month's file. One raw
  * file ↦ one (file_year, file_month) partition.
  *
  * Commit mechanics: the month partitions are written with DYNAMIC
  * partition overwrite (only the months present in the increment are
  * replaced), which makes a tick IDEMPOTENT — reprocessing a file
  * replaces its month with identical rows rather than duplicating it.
  * The processed-file ledger is a tiny text namespace under the fact
  * dir, appended AFTER the data commit: a crash between the two
  * re-processes the file on the next tick, which the overwrite
  * absorbs (at-least-once file handling, exactly-once month state —
  * the same contract a streaming file source's checkpoint provides,
  * chosen over `readStream.text` because discovery must not re-READ
  * raw bytes, and over a fixed-schema csv stream because the monthly
  * files are schema-heterogeneous and need per-file header reads).
  *
  * Scale shape: discovery is one driver-side directory listing (one
  * entry per monthly scrape file, the [[Staging.listingFromDir]]
  * posture); the per-tick work is proportional to the NEW months
  * only; downstream month-scoped KPI reads prune at the planner
  * against the partitioned fact ([[Warehouse.writeFact]] notes).
  */
object Refresh {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // NOT underscore-prefixed: Spark's file listing treats `_*` paths as
  // hidden metadata and can silently skip them on read
  private def ledgerDir(factDir: String) = new Path(factDir, "processed_ledger")
  private def dataDir(factDir: String) = new Path(factDir, "data").toString

  /** Paths already processed by earlier ticks (empty on first run). */
  def processedFiles(spark: SparkSession, factDir: String): Set[String] = {
    val dir = ledgerDir(factDir)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Set.empty
    else spark.read.textFile(dir.toString).collect().toSet
  }

  /** One refresh tick. Returns the newly processed file paths (empty =
    * nothing to do). `filesPerMonth` sizes the per-partition output
    * files exactly as [[Warehouse.writeFact]]. */
  def refreshFact(spark: SparkSession, rawDir: String, factDir: String,
                  filesPerMonth: Int = 1): Seq[String] = {
    val raw = new Path(rawDir)
    val f = fs(spark, raw)
    val all = f.globStatus(new Path(rawDir, "*listings*.csv"))
      .map(_.getPath.toString).sorted.toSeq
    val done = processedFiles(spark, factDir)
    val fresh = all.filterNot(done)
    if (fresh.isEmpty) return Nil

    val stagingLocation = Staging.location(
      Ingest.rawSsc(spark, rawDir), Ingest.rawLga(spark, rawDir))
    val staged = Staging.listing(fresh.map(p => Ingest.rawListings(spark, p)))
    val fact = Warehouse.factListing(staged, stagingLocation)

    // dynamic overwrite: replace exactly the increment's months
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try {
      fact
        .repartition(org.apache.spark.sql.functions.col("file_year"),
          org.apache.spark.sql.functions.col("file_month"),
          org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.hash(
              org.apache.spark.sql.functions.col("id")),
            org.apache.spark.sql.functions.lit(filesPerMonth)))
        .write.mode("overwrite")
        .partitionBy("file_year", "file_month")
        .parquet(dataDir(factDir))
    } finally prior.fold(spark.conf.unset(key))(spark.conf.set(key, _))

    // ledger append AFTER the data commit (see Scaladoc)
    import spark.implicits._
    fresh.toDF("value").coalesce(1)
      .write.mode("append").text(ledgerDir(factDir).toString)
    fresh
  }

  /** The maintained fact table (partition-pruned monthly reads). */
  def fact(spark: SparkSession, factDir: String): DataFrame =
    spark.read.parquet(dataDir(factDir))
}
