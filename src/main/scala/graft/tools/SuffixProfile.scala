package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Dedup, Scale}

/** Dev-only wall timing for suffixSpans at sf0.1 — whole-query
  * (min-of-2 after warmup, the Bench methodology) plus a per-stage
  * breakdown that mirrors the operator's materialization points so
  * optimization effort lands where the seconds are.
  */
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

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    // per-stage mirror of Dedup.suffixSpans (rounds=6)
    def staged(): Unit = {
      val (id, text, rounds) = (col("doc_id"), col("text"), 6)
      val docToks = timed("docToks checkpoint") {
        docs.filter(text.isNotNull)
          .select(id.as("doc"), split(lower(text), " ").as("toks"))
          .repartition(col("doc"))
          .localCheckpoint(true)
      }
      val toks = docToks
        .select(col("doc"), size(col("toks")).cast("long").as("dlen"),
          posexplode(col("toks")).as(Seq("pos", "tok")))
        .select(col("doc"), col("dlen"), col("pos").cast("long").as("pos"),
          expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)")
            .as("tk"))
      var cur = timed("rank0") {
        Scale.globalDenseRankBy(toks, Seq(col("tk")), parts = 0)
          .select(col("doc"), col("dlen"), col("pos"),
            col("dense_rn").as("r"))
          .repartition(col("doc"))
          .localCheckpoint(true)
      }
      val nTok = timed("count") {
        docToks.agg(sum(size(col("toks"))).cast("long")).head.getLong(0)
      }
      val bits = 64 - java.lang.Long.numberOfLeadingZeros(nTok + 2)
      val packB = 1L << bits
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc")).orderBy(col("pos"))
      for (k <- 1 to rounds) {
        val off = (1L << (k - 1)).toInt
        val paired = cur.withColumn("rb",
          coalesce(lead(col("r"), off).over(wDoc), lit(-1L)))
        cur = timed(s"round $k") {
          if (k == rounds)
            paired.select(col("doc"), col("dlen"), col("pos"),
              col("r"), col("rb"))
          else if (k % 2 == 1)
            paired.select(col("doc"), col("dlen"), col("pos"),
              (col("r") * packB + col("rb") + 1).as("r"))
          else
            Scale.globalDenseRankBy(paired, Seq(col("r"), col("rb")),
                parts = 0)
              .select(col("doc"), col("dlen"), col("pos"),
                col("dense_rn").as("r"))
              .repartition(col("doc"))
              .localCheckpoint(true)
        }
      }
      val orderKeys =
        if (cur.columns.contains("rb"))
          Seq(col("r"), col("rb"), col("doc"), col("pos"))
        else Seq(col("r"), col("doc"), col("pos"))
      val sa = timed("suffix order") {
        Scale.globalRowNumberBy(cur, orderKeys)
          .withColumnRenamed("global_rn", "srn")
          .localCheckpoint(true)
      }
      val bAdj = sa.select((col("srn") - 1).as("srn"),
        col("doc").as("doc_b"), col("pos").as("pos_b"),
        col("dlen").as("dlen_b"))
      val pairs = sa.join(bAdj, Seq("srn"))
        .select(col("doc").as("doc_a"), col("pos").as("pos_a"),
          col("dlen").as("dlen_a"),
          col("doc_b"), col("pos_b"), col("dlen_b"))
      val ta = docToks.select(col("doc").as("__da"), col("toks").as("__ta"))
      val tb = docToks.select(col("doc").as("__db"), col("toks").as("__tb"))
      val depthCap = (1L << (rounds + 1)) - 1
      val scored = pairs
        .join(ta, col("doc_a") === col("__da"))
        .join(tb, col("doc_b") === col("__db"))
        .withColumn("__m", least(col("dlen_a") - col("pos_a"),
          col("dlen_b") - col("pos_b"), lit(depthCap)))
        .withColumn("lcp_tokens", expr(
          """CAST(coalesce(
            |  nullif(array_position(
            |    zip_with(slice(__ta, CAST(pos_a + 1 AS INT), CAST(__m AS INT)),
            |             slice(__tb, CAST(pos_b + 1 AS INT), CAST(__m AS INT)),
            |             (x, y) -> x = y),
            |    false), 0) - 1,
            |  __m) AS BIGINT)""".stripMargin))
        .drop("__da", "__ta", "__db", "__tb", "__m")
        .filter(col("lcp_tokens") >= 8)
      timed("pairs+LCP+rollup") {
        scored.groupBy(col("doc_a"), col("doc_b"))
          .agg(max(col("lcp_tokens")).as("lss"), count(lit(1)).as("n"))
          .orderBy(col("lss").desc).limit(20)
          .write.format("noop").mode("overwrite").save()
      }
    }

    def once(): Double = {
      val t0 = System.nanoTime()
      Dedup.suffixSpans(docs, col("doc_id"), col("text")).count()
      (System.nanoTime() - t0) / 1e9
    }
    println("staged warmup:")
    staged()
    println("staged timed:")
    staged()
    println(f"whole-query warmup: ${once()}%.2fs")
    println(f"whole-query timed:  ${Seq(once(), once()).min}%.2fs")
    spark.stop()
  }
}
