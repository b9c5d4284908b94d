package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

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
  * source file and the dims, never on another month's file. The
  * commit unit is the month partition; when several files share a
  * month, the tick that completes the month re-includes its earlier
  * files (see [[refreshFact]]). "The dims are static" is VERIFIED,
  * not assumed: each tick digests the geography side files and a
  * change forces a full rebuild (see [[dimDigest]]), mirroring the
  * reference's `ALTER EXTERNAL TABLE ... REFRESH` on raw_location
  * followed by the CREATE-OR-REPLACE chain (populate.py:65–68).
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
  * Crash ordering per tick: data commit → schema sidecar → ledger →
  * dim digest. A crash between any two steps re-runs the tick's files
  * next time (ledger/digest still stale), and the dynamic overwrite
  * absorbs the repeat.
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
  private def schemaFile(factDir: String) = new Path(factDir, "fact_schema.json")
  private def digestFile(factDir: String) = new Path(factDir, "dim_digest")

  /** The geography side files [[Staging.location]] reads — the dims the
    * fact build actually joins ([[Ingest.rawSsc]]/[[Ingest.rawLga]]). */
  private val dimGlobs = Seq("*SSC*.csv", "*LGA_2020*.csv")

  /** Paths already processed by earlier ticks (empty on first run). */
  def processedFiles(spark: SparkSession, factDir: String): Set[String] = {
    val dir = ledgerDir(factDir)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Set.empty
    else spark.read.textFile(dir.toString).collect().toSet
  }

  /** Fingerprint of the dim side files: (name, length, mtime) per file,
    * sorted, hashed. O(#dim files) driver-side stat calls — no content
    * read, so ticking stays cheap when the dims are multi-GB. The
    * (len, mtime) pair is the standard change detector; the residual
    * blind spot (a same-length rewrite inside one mtime granule) is the
    * same one every mtime-based build system accepts. */
  private def dimDigest(spark: SparkSession, rawDir: String): String = {
    val f = fs(spark, new Path(rawDir))
    val entries = dimGlobs
      .flatMap(g => f.globStatus(new Path(rawDir, g)).toSeq)
      .map(st => s"${st.getPath.getName}|${st.getLen}|${st.getModificationTime}")
      .sorted
    java.security.MessageDigest.getInstance("MD5")
      .digest(entries.mkString("\n").getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  private def readSmall(spark: SparkSession, p: Path): Option[String] = {
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  private def writeSmall(spark: SparkSession, p: Path, s: String): Unit = {
    val out = fs(spark, p).create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The month a file's rows will land in, parsed from the filename
    * EXACTLY as the fact build does: `..._MM_YYYY.csv` via
    * negative-index split_part CAST TO INT (design.sql:454–455,
    * [[Warehouse.factListing]]). Keying on the parsed (year, month)
    * pair — not the raw tokens — means `listings_5_2020.csv` and
    * `listings_05_2020.csv` share a key, exactly as their rows share a
    * month partition; with raw tokens the reprocess guard would miss
    * the earlier spelling and the month overwrite would silently drop
    * its rows. A name that doesn't parse keys to itself, so it can
    * never group with another file. */
  private def monthKey(path: String): String = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    val parts = base.split('_')
    val parsed =
      if (parts.length < 3) None
      else for {
        m <- parts(parts.length - 2).toIntOption
        y <- parts.last.takeWhile(_ != '.').toIntOption
      } yield s"$y-$m"
    parsed.getOrElse(base)
  }

  /** One refresh tick. Returns the newly processed file paths (empty =
    * nothing to do). `filesPerMonth` sizes the per-partition output
    * files exactly as [[Warehouse.writeFact]].
    *
    * Because the commit unit is a MONTH partition (dynamic overwrite)
    * while the discovery unit is a FILE, a tick that brings a new file
    * into an ALREADY-BUILT month must re-include that month's earlier
    * files in the increment — otherwise the overwrite would replace
    * the month with the new file's rows alone, silently dropping the
    * earlier ones. Normal operation has one file per month (the
    * reference layout), so the reprocess set is empty.
    *
    * Dim invalidation: if the geography side files changed since the
    * last tick (digest mismatch), every already-built month is stale —
    * the tick reprocesses ALL files. Every month re-derives and the
    * dynamic overwrite replaces it (a month can never vanish: the
    * fact's row filters — price/host_id/snapshot validity — don't
    * depend on the dims, and the dim joins are LEFT + sentinel). */
  def refreshFact(spark: SparkSession, rawDir: String, factDir: String,
                  filesPerMonth: Int = 1): Seq[String] = {
    val raw = new Path(rawDir)
    val f = fs(spark, raw)
    val all = f.globStatus(new Path(rawDir, "*listings*.csv"))
      .map(_.getPath.toString).sorted.toSeq
    val digest = dimDigest(spark, rawDir)
    val dimsChanged =
      readSmall(spark, digestFile(factDir)).exists(_ != digest)
    val done =
      if (dimsChanged) Set.empty[String]
      else processedFiles(spark, factDir)
    val fresh = all.filterNot(done)
    if (fresh.isEmpty) return Nil
    // earlier files of the months this increment touches (see Scaladoc)
    val freshMonths = fresh.map(monthKey).toSet
    val reprocess = all.filter(p => done(p) && freshMonths(monthKey(p)))

    val stagingLocation = Staging.location(
      Ingest.rawSsc(spark, rawDir), Ingest.rawLga(spark, rawDir))
    val staged = Staging.listing(
      (fresh ++ reprocess).map(p => Ingest.rawListings(spark, p)))
    val fact = Warehouse.factListing(staged, stagingLocation)

    // dynamic overwrite: replace exactly the increment's months
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try Warehouse.writeFact(fact, dataDir(factDir), filesPerMonth)
    finally prior.fold(spark.conf.unset(key))(spark.conf.set(key, _))

    // schema sidecar: lets [[Refresh.fact]] stay readable when a tick
    // commits ZERO rows (every row filtered) — parquet then has no
    // files to infer from. Partition columns last, the read-back order.
    val parts = Set("file_year", "file_month")
    val sidecar = StructType(
      fact.schema.filterNot(sf => parts(sf.name)) ++
        fact.schema.filter(sf => parts(sf.name)))
    writeSmall(spark, schemaFile(factDir), sidecar.json)

    // ledger after the data commit (see Scaladoc); a dim rebuild owns
    // the whole history, so it rewrites the ledger instead of appending
    import spark.implicits._
    fresh.toDF("value").coalesce(1)
      .write.mode(if (dimsChanged) "overwrite" else "append")
      .text(ledgerDir(factDir).toString)
    writeSmall(spark, digestFile(factDir), digest)
    fresh
  }

  /** The maintained fact table (partition-pruned monthly reads). When
    * no data files exist yet — every processed row was filtered — an
    * empty frame with the committed schema, not a schema-inference
    * error. */
  def fact(spark: SparkSession, factDir: String): DataFrame = {
    val dd = new Path(dataDir(factDir))
    val f = fs(spark, dd)
    def hasDataFile: Boolean = {
      val it = f.listFiles(dd, true)
      var found = false
      while (!found && it.hasNext) {
        val n = it.next().getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) found = true
      }
      found
    }
    if (f.exists(dd) && hasDataFile) spark.read.parquet(dd.toString)
    else readSmall(spark, schemaFile(factDir)) match {
      case Some(json) =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row],
          DataType.fromJson(json).asInstanceOf[StructType])
      case None => sys.error(
        s"no fact committed under $factDir (run refreshFact first)")
    }
  }
}
