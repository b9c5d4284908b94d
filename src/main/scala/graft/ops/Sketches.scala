package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–Min sketch (Cormode & Muthukrishnan 2005) as a DataFrame
  * program — the mergeable frequency summary a 100 TB engine uses when
  * exact per-key counts would shuffle every key but only HEAVY HITTERS
  * are wanted.
  *
  * Unlike the approximate aggregates in `x_sketch_suite` (HLL /
  * percentile_approx, whose estimates are engine-specific and can only
  * be BOUND-checked), this sketch is built from the engine-portable
  * 56-bit MD5 hash ([[Sampling.hashValue]]) and pure integer counting,
  * so another engine replays the ENTIRE sketch bit-exactly: cell
  * counters, per-item estimates, and the overcount are all
  * hash-matchable values, not tolerance checks.
  *
  * Scale shape: the sketch is ONE map-side-combinable aggregation into
  * `depth × width` cells — a shuffle of at most (partitions × d·w)
  * partial rows regardless of corpus size, and the cells table itself
  * is tiny and broadcast-joinable. Merging two corpora's sketches is
  * `UNION ALL` + re-sum, which is why the structure survives
  * distribution: every partial is itself a valid sketch. The CM
  * guarantee (estimate ≥ true count, overcount ≤ εN with probability
  * 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉) holds per min-of-d-rows estimate;
  * the ≥ lower bound is deterministic and is emitted as `overcount =
  * est − exact ≥ 0` for the probe set.
  */
object Sketches {

  /** Per-row cell key: `hash(j ++ ":" ++ key) % width` — the j-th hash
    * function of the standard CM construction, derived from one MD5
    * family ([[Sampling.hashBucket]]) by seed-prefixing. */
  private def cell(j: Column, key: Column, width: Int): Column =
    Sampling.hashBucket(concat(j.cast("string"), lit(":"), key.cast("string")), width)

  private def cellSql(jExpr: String, keyExpr: String, width: Int): String =
    Sampling.hashBucketSql(
      s"CAST($jExpr AS VARCHAR) || ':' || CAST($keyExpr AS VARCHAR)", width)

  /** The sketch: `(j, bucket, cnt)` — exactly `depth` rows of `width`
    * counters (cells no row hashed into are absent ≡ zero).
    *
    * Built collapse-first: occurrences are counted per key (map-side
    * combinable — the partial aggregate reduces each partition to its
    * DISTINCT keys before anything is hashed), then only the distinct
    * frame is md5'd, weighted by its frequency. Algebraically identical
    * to hashing every occurrence (a cell's counter is Σ freq(key) over
    * keys hashing into it) but the d-fold md5 work scales with the key
    * VOCABULARY, not the corpus — measured 15.8 s → sub-second at sf0.1
    * on the 6M-row lineitem stream (4 digests per row vs per distinct
    * supplier). */
  def countMinCells(df: DataFrame, key: Column,
                    depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape d=$depth w=$width")
    val freq = df.select(key.as("__key"))
      .groupBy(col("__key")).agg(count(lit(1)).as("__freq"))
    freq
      .select(explode(array((0 until depth).map(lit(_)): _*)).as("j"),
        col("__key"), col("__freq"))
      .select(col("j"), cell(col("j"), col("__key"), width).as("bucket"),
        col("__freq"))
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("__freq")).as("cnt"))
  }

  /** Point estimates for `probes` (a SMALL keyed relation — it is
    * broadcast): min over the d cells each probe key hashes into.
    * Returns `probes` columns plus `cms_est`. */
  def countMinEstimate(cells: DataFrame, probes: DataFrame, probeKey: Column,
                       depth: Int = 4, width: Int = 256): DataFrame = {
    val keyed = probes.select(probes.columns.map(col) :+
      explode(array((0 until depth).map(lit(_)): _*)).as("__j"): _*)
      .withColumn("__bucket", cell(col("__j"), probeKey, width))
    val joined = cells.join(broadcast(keyed),
      col("j") === col("__j") && col("bucket") === col("__bucket"))
    joined.groupBy(probes.columns.map(col): _*)
      .agg(min(col("cnt")).as("cms_est"))
  }

  /** Join-size estimation from two sketches (Cormode & Muthukrishnan's
    * inner-product estimator): |A ⋈ B| on the sketched key =
    * Σ_k fA(k)·fB(k) ≈ min over the d rows of Σ_bucket cntA·cntB.
    * Never underestimates (collisions only add mass), and needs only
    * the two d×w summaries — the cost-based-optimizer primitive that
    * prices a join without touching either table again. Pass the same
    * cells twice for the self-join size (the F₂ moment, the standard
    * skew statistic). Returns one row: `cms_join_size`. */
  def countMinJoinSize(cellsA: DataFrame, cellsB: DataFrame): DataFrame = {
    val b = cellsB.select(col("j").as("jb"), col("bucket").as("bb"),
      col("cnt").as("cnt_b"))
    cellsA.join(b, col("j") === col("jb") && col("bucket") === col("bb"))
      .groupBy(col("j"))
      .agg(sum(col("cnt") * col("cnt_b")).as("ip"))
      .agg(min(col("ip")).as("cms_join_size"))
  }

  /** K-minimum-values distinct sketch (Bar-Yossef et al. 2002; the
    * KMV/theta-sketch family) — the MERGEABLE distinct-count summary
    * that, unlike HLL, also supports SET OPERATIONS (union by merging
    * k-smallest lists, intersection via the Jaccard of sketch
    * members), and unlike Spark's HLL is built from the
    * engine-portable 56-bit MD5 hash — so another engine replays the
    * sketch CONTENT bit-exactly, not just bound-checks an estimate.
    *
    * Per group: the k smallest hashes of the DISTINCT keys (a sorted
    * long array), `n_kept = min(k, distinct)`, and the estimator
    *   D̂ = (k−1) · 2⁵⁶ / u_k   (u_k = k-th smallest hash)
    * — exact (= n_kept) below saturation. The double division is the
    * only float op, from exact integers.
    *
    * Scale shape: one distinct-shuffle on (group, key), then a
    * rank-≤-k filter whose partial WindowGroupLimit forwards at most
    * k rows per group per map task; the sketch table is |groups|-sized.
    * Merging sketches (union) is an ARRAY op on two bounded lists —
    * see `x_sketch_kmv_setops`. */
  def kmvSketch(df: DataFrame, group: Column, key: Column,
                k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val dk = df.select(group.as("grp"), key.as("__k"))
      .filter(col("__k").isNotNull).distinct()
      .select(col("grp"), Sampling.hashValue(col("__k")).as("h"))
    val w = Window.partitionBy(col("grp")).orderBy(col("h"))
    dk.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(col("h"))).as("kmv"))
      .withColumn("n_kept", size(col("kmv")).cast("long"))
      .withColumn("est_distinct", round(
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 56))
            / element_at(col("kmv"), k).cast("double")), 6))
  }

  /** DuckDB CTE chain replaying [[kmvSketch]] over `srcCte` (columns
    * grp, k0 = the raw key); final CTE `__kmv_out` has
    * (grp, kmv, n_kept, est_distinct). */
  def kmvSketchSql(srcCte: String, k: Int): String = {
    s"""__kmv_h AS (
      SELECT grp, ${Sampling.hashValueSql("k0")} AS h
      FROM (SELECT DISTINCT grp, k0 FROM $srcCte WHERE k0 IS NOT NULL)),
    __kmv_k AS (
      SELECT grp, h FROM __kmv_h
      QUALIFY ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) <= $k),
    __kmv_out AS (
      SELECT grp, kmv, n_kept,
        ROUND(CASE WHEN n_kept < $k THEN CAST(n_kept AS DOUBLE)
          ELSE CAST(${k - 1} AS DOUBLE) * CAST(72057594037927936 AS DOUBLE)
            / CAST(kmv[$k] AS DOUBLE) END, 6) AS est_distinct
      FROM (
        SELECT grp, list(h ORDER BY h) AS kmv,
          CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM __kmv_k GROUP BY 1))"""
  }

  /** DuckDB CTE chain replaying [[countMinCells]] + [[countMinEstimate]]
    * over `srcCte` (one column `$keyCol`) and probe CTE `probesCte`
    * (columns incl. `$keyCol`); final relation `$out` = probes columns +
    * `cms_est`. `probeCols` lists the probe CTE's columns. */
  def countMinSql(srcCte: String, keyCol: String, probesCte: String,
                  probeCols: Seq[String], out: String,
                  depth: Int = 4, width: Int = 256): String = {
    val js = (0 until depth).mkString(", ")
    val cols = probeCols.mkString(", ")
    s"""__cm_js AS (SELECT unnest([$js]) AS j),
    __cm_freq AS (
      SELECT $keyCol, COUNT(*) AS __freq FROM $srcCte GROUP BY 1),
    __cm_cells AS (
      SELECT j, ${cellSql("j", keyCol, width)} AS bucket,
        CAST(SUM(__freq) AS BIGINT) AS cnt
      FROM __cm_freq CROSS JOIN __cm_js
      GROUP BY 1, 2),
    __cm_keyed AS (
      SELECT $cols, j AS __j,
        ${cellSql("j", keyCol, width)} AS __bucket
      FROM $probesCte CROSS JOIN __cm_js),
    $out AS (
      SELECT $cols, MIN(cnt) AS cms_est
      FROM __cm_cells JOIN __cm_keyed
        ON j = __j AND bucket = __bucket
      GROUP BY ${(1 to probeCols.size).mkString(", ")})"""
  }
}
