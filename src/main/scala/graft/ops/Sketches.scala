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

  /** HyperLogLog register file (Flajolet, Fusy, Gandouet & Meunier
    * 2007) as a DataFrame program — the industry-standard mergeable
    * distinct-count sketch, built (like [[kmvSketch]]) from the
    * engine-portable 56-bit MD5 hash so another engine replays the
    * ENTIRE sketch bit-exactly: every register value, the zero-register
    * count, the harmonic-sum integer, and the estimate itself are
    * hash-matchable — where Spark's own `approx_count_distinct` (also
    * HLL) exposes only an engine-specific estimate that can merely be
    * bound-checked (`x_sketch_suite` does that; this one proves the
    * full construction).
    *
    * Construction (m = 64 registers, b = 6):
    *   bucket = h mod 64,  w = h >> 6  (50 bits),
    *   rho(w) = leading zeros of the 50-bit w plus 1
    *          = 51 − bitlength(w)   (= 51 when w = 0),
    *   register_j = max rho over keys in bucket j.
    * Exactness discipline: the harmonic sum Σ 2^−register is kept as
    * the INTEGER Z = Σ 2^(51−register) + 2^51·(empty registers) — at
    * most 64·2^51 < 2^58, exact in a long — because the float sum of
    * mixed-magnitude dyadics needs 57 mantissa bits and would not be
    * reproducible. The estimate α·m²·2^51 / Z is then ONE double
    * division of engine-shared literals ([[java.lang.Double.toString]]
    * round-trips, per the cross-engine constant convention), and the
    * small-range linear-counting branch m·ln(m/V) has only 64 possible
    * values, precomputed once in Scala and embedded as the SAME
    * literal table in both engines — ln is never evaluated per-engine.
    *
    * Scale shape: one map-side-combinable MAX aggregation into at most
    * |groups|·64 register rows — each partition's partial is itself a
    * valid sketch (max is idempotent/commutative), which is exactly
    * why HLL survives distribution; the register table is tiny and the
    * merge of two corpora's sketches is a further groupBy-max (see
    * `x_sketch_hll_union`). Nothing corpus-sized ever shuffles. */
  val HllM = 64
  private val HllShift = 51 // rho ∈ [1, 51]; 2^(51-rho) keeps Z integral
  /** α₆₄·m²·2⁵¹ — the estimator numerator, one shared literal. */
  val HllNumerator: Double = 0.709 * HllM * HllM * math.pow(2, HllShift).toLong
  /** Linear-counting table: index V (zero registers) → m·ln(m/V);
    * index 0 unused (V = 0 never takes this branch). */
  val HllLinearTable: IndexedSeq[Double] =
    (0 to HllM).map(v => if (v == 0) 0.0 else HllM * math.log(HllM.toDouble / v))
  /** Small-range threshold 2.5·m of the 2007 paper. */
  val HllSmallRange: Double = 2.5 * HllM

  def hllSketch(df: DataFrame, group: Column, key: Column): DataFrame = {
    val h = df.select(group.as("grp"), key.as("__k"))
      .filter(col("__k").isNotNull)
      .select(col("grp"), Sampling.hashValue(col("__k")).as("h"))
    val regs = h
      .select(col("grp"), (col("h") % HllM).as("bucket"),
        shiftright(col("h"), 6).as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(HllShift))
          .otherwise(lit(HllShift) - length(bin(col("w")))))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("reg"))
    hllEstimate(regs)
  }

  /** Estimator + content columns from a register file
    * `(grp, bucket, reg)` — split out so merged sketches
    * (groupBy-max of register UNIONs) reuse it. */
  def hllEstimate(regs: DataFrame): DataFrame = {
    val linear = array(HllLinearTable.map(lit): _*)
    regs
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).cast("long").as("n_hit"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($HllShift - reg AS INT))"))
          .as("z_partial"),
        concat_ws(",",
          transform(sort_array(collect_list(struct(col("bucket"), col("reg")))),
            s => concat(s("bucket"), lit(":"), s("reg")))).as("registers_csv"))
      .withColumn("v_zero", (lit(HllM) - col("n_hit")).cast("long"))
      .withColumn("z_int",
        col("z_partial") + col("v_zero") * lit(1L << HllShift))
      .withColumn("est_raw",
        lit(HllNumerator) / col("z_int").cast("double"))
      .withColumn("est_hll", round(
        when(col("v_zero") > 0 && col("est_raw") <= lit(HllSmallRange),
          element_at(linear, col("v_zero").cast("int") + 1))
          .otherwise(col("est_raw")), 6))
      .select(col("grp"), col("n_hit"), col("v_zero"), col("z_int"),
        col("est_hll"), col("registers_csv"))
  }

  private def dlit(x: Double): String =
    s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"

  /** Q-digest (Shrivastava, Buragohain, Agrawal & Suri 2004) — the
    * DETERMINISTIC mergeable quantile summary, in contrast to the
    * engine-private KLL behind `approx_percentile`: the construction is
    * pure integer arithmetic over the dyadic tree of the value domain,
    * so the entire digest — every (level, prefix, count) node — and
    * every quantile estimate replays bit-exactly in another engine,
    * and the q-digest rank-error GUARANTEE (≤ n·log₂(u)/k) can be
    * hash-checked rather than merely trusted.
    *
    * Construction over a `bits`-bit integer domain (u = 2^bits):
    * count per leaf value, then for level l = bits … 1, any parent
    * whose subtree-so-far weight (both children + itself) is ≤
    * ⌊n/k⌋ absorbs its children. Quantile query: walk nodes in
    * (hi, lo) order accumulating counts; the first node reaching rank
    * r = ⌈q·n⌉ answers with its `hi` (an upper-bound estimate —
    * rank(est) ≥ r always; the guarantee bounds the overshoot).
    *
    * Scale shape: the ONLY corpus-sized op is the leaf-count groupBy
    * (map-side combinable; its output is bounded by the 2^bits domain,
    * NOT the row count — the sketch's reason to exist). The `bits`
    * compression rounds then each run one aggregate + one broadcast
    * anti-join over a ≤ 2^bits-row frame that only shrinks, with an
    * eager localCheckpoint per round to keep the unrolled plan
    * bounded. Digest size is O(k·log u) regardless of data. Merging
    * two digests = UNION ALL + per-node count sum + recompress with
    * the combined n — same rounds, never re-touching either corpus. */
  def qdigestBuild(df: DataFrame, value: Column, bits: Int, k: Int): DataFrame = {
    require(bits >= 2 && bits <= 32, s"bits in [2,32], got $bits")
    require(k >= 2, s"compression factor k >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    // The ONLY corpus-sized op: a map-side-combinable leaf count whose
    // output is bounded by the 2^bits domain, not the row count.
    val leaves = df.select(value.cast("long").as("v"))
      .filter(col("v").isNotNull && col("v") >= 0 && col("v") < (1L << bits))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)]
    // The compression recursion is O(2^bits · bits) integer work over a
    // DOMAIN-bounded frame that only shrinks — never corpus-sized — so
    // it runs as ONE gated single-task pass (the repo's union-find
    // precedent) instead of `bits` scheduler rounds of
    // aggregate+join+anti-join: the earlier round-based form spent its
    // entire 8 s wall on per-round job floors (measured 1.2× at 100×
    // rows — pure fixed cost). coalesce(1) folds the final aggregation
    // into the same single task without a second exchange.
    val compressed = leaves.coalesce(1).mapPartitions { it =>
      val levels =
        Array.fill(bits + 1)(scala.collection.mutable.LongMap.empty[Long])
      var n = 0L
      it.foreach { case (v, c) => levels(bits).update(v, c); n += c }
      val thr = n / k
      var l = bits
      while (l >= 1) {
        val children = levels(l)
        val parents = levels(l - 1)
        val grouped = scala.collection.mutable.LongMap.empty[Long]
        children.foreach { case (p, c) =>
          val pp = p >>> 1
          grouped.update(pp, grouped.getOrElse(pp, 0L) + c)
        }
        // merges at one level are independent (each group key touches
        // only its own two children and parent), so map order is
        // immaterial and the result is bit-identical to the unrolled
        // per-round DataFrame recursion the oracle SQL replays
        grouped.foreach { case (pp, csum) =>
          val tot = csum + parents.getOrElse(pp, 0L)
          if (tot <= thr) {
            children.remove(pp << 1)
            children.remove((pp << 1) | 1L)
            parents.update(pp, tot)
          }
        }
        l -= 1
      }
      (0 to bits).iterator.flatMap(lev =>
        levels(lev).iterator.map { case (p, c) => (lev, p, c, n, thr) })
    }.toDF("level", "prefix", "cnt", "n", "thr")
    val span = s"shiftleft(CAST(1 AS BIGINT), CAST($bits - level AS INT))"
    compressed.select(col("level"), col("prefix"), col("cnt"),
      expr(s"prefix * $span").as("lo"),
      expr(s"(prefix + 1) * $span - 1").as("hi"),
      col("n"), col("thr"))
  }

  /** Quantile estimates from a built digest: for each q, the first
    * node in (hi, lo) order whose running count reaches r = ⌈q·n⌉
    * answers with `hi`; alongside, the TRUE rank of that answer and
    * the q-digest guarantee check `rank_err ≤ n·bits/k` computed from
    * exact leaf counts (`exact` must be the pre-digest rows of the
    * same value domain). Windows here order a ≤ O(k·log u)-row digest
    * and the ≤ 2^bits-row leaf table — bounded frames, not the
    * corpus. */
  def qdigestQuantiles(digest: DataFrame, exact: DataFrame, value: Column,
                       qs: Seq[Double], bits: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cum = digest.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("hi"), col("lo"))))
      .select(col("hi"), col("lo"), col("cnt"), col("cum"))
    val qdf = qs.foldLeft(Option.empty[DataFrame]) { (acc, q) =>
      val one = digest.select(col("n")).limit(1)
        .select(lit(q).as("q"),
          ceil(lit(q) * col("n")).cast("long").as("r"), col("n"))
      Some(acc.fold(one)(_.unionByName(one)))
    }.get
    val est = cum.join(broadcast(qdf), col("cum") >= col("r"))
      .groupBy(col("q"), col("r"), col("n"))
      .agg(min(col("hi")).as("est"))
    val leafCum = exact.select(value.cast("long").as("v"))
      .filter(col("v").isNotNull && col("v") >= 0 && col("v") < (1L << bits))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("lcum", sum(col("c")).over(Window.orderBy(col("v"))))
    // true rank of the estimate = #values <= est; true quantile = min v
    // with cumulative count >= r
    val trueRank = est.join(leafCum, col("v") <= col("est"))
      .groupBy(col("q"), col("r"), col("n"), col("est"))
      .agg(max(col("lcum")).as("est_rank"))
    val exactQ = est.join(leafCum, col("lcum") >= col("r"))
      .groupBy(col("q")).agg(min(col("v")).as("exact_q"))
    trueRank.join(exactQ, Seq("q"))
      .withColumn("rank_err", col("est_rank") - col("r"))
      .withColumn("within_bound",
        col("rank_err") * k <= col("n") * bits)
      .select(col("q"), col("n"), col("r"), col("est"), col("est_rank"),
        col("exact_q"), col("rank_err"), col("within_bound"))
  }

  /** DuckDB CTE chain replaying [[qdigestBuild]] over `srcCte` (one
    * column `v`, pre-cast integral); final CTE `__qd_out` mirrors the
    * digest schema. One CTE trio per compression round, emitted by the
    * same loop the DataFrame build runs. */
  def qdigestBuildSql(srcCte: String, bits: Int, k: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""__qd_leaves AS (
      SELECT $bits AS level, v AS prefix, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM $srcCte
      WHERE v IS NOT NULL AND v >= 0 AND v < ${1L << bits}
      GROUP BY 2),
    __qd_stats AS (
      SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n,
        CAST(COALESCE(SUM(cnt), 0) // $k AS BIGINT) AS thr
      FROM __qd_leaves),
    __qd_n$bits AS MATERIALIZED (
      SELECT level, prefix, cnt, n, thr
      FROM __qd_leaves CROSS JOIN __qd_stats)""")
    for (l <- bits to 1 by -1) {
      sb.append(s""",
    __qd_m$l AS MATERIALIZED (
      SELECT ${l - 1} AS level, c.pp AS prefix,
        c.csum + COALESCE(p.cnt, 0) AS cnt, c.n, c.thr
      FROM (
        SELECT prefix >> 1 AS pp, CAST(SUM(cnt) AS BIGINT) AS csum, ANY_VALUE(n) AS n,
          ANY_VALUE(thr) AS thr
        FROM __qd_n$l WHERE level = $l GROUP BY 1) c
      LEFT JOIN (SELECT prefix, cnt FROM __qd_n$l WHERE level = ${l - 1}) p
        ON c.pp = p.prefix
      WHERE c.csum + COALESCE(p.cnt, 0) <= c.thr),
    __qd_n${l - 1} AS MATERIALIZED (
      SELECT x.level, x.prefix, x.cnt, x.n, x.thr FROM __qd_n$l x
      WHERE (CASE WHEN x.level = $l THEN x.prefix >> 1
                  WHEN x.level = ${l - 1} THEN x.prefix END)
        NOT IN (SELECT prefix FROM __qd_m$l)
         OR x.level NOT IN ($l, ${l - 1})
      UNION ALL
      SELECT level, prefix, cnt, n, thr FROM __qd_m$l)""")
    }
    sb.append(s""",
    __qd_out AS (
      SELECT level, prefix, cnt,
        prefix * (CAST(1 AS BIGINT) << ($bits - level)) AS lo,
        (prefix + 1) * (CAST(1 AS BIGINT) << ($bits - level)) - 1 AS hi,
        n, thr
      FROM __qd_n0)""")
    sb.toString
  }

  /** DuckDB replay of [[qdigestQuantiles]] over `__qd_out` (from
    * [[qdigestBuildSql]]) and the same `srcCte`. Final CTE
    * `__qdq_out`. */
  def qdigestQuantilesSql(srcCte: String, qs: Seq[Double],
                          bits: Int, k: Int): String = {
    val qList = qs.map(q => s"(${dlit(q)})").mkString(", ")
    s"""__qdq_cum AS (
      SELECT hi, lo, cnt,
        CAST(SUM(cnt) OVER (ORDER BY hi, lo) AS BIGINT) AS cum
      FROM __qd_out),
    __qdq_qs AS (
      SELECT q, CAST(ceil(q * n) AS BIGINT) AS r, n
      FROM (SELECT unnest([$qList]) AS q) CROSS JOIN __qd_stats),
    __qdq_est AS (
      SELECT q, r, n, MIN(hi) AS est
      FROM __qdq_cum JOIN __qdq_qs ON cum >= r
      GROUP BY 1, 2, 3),
    __qdq_leafcum AS (
      SELECT v, c, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS lcum
      FROM (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM $srcCte
        WHERE v IS NOT NULL AND v >= 0 AND v < ${1L << bits}
        GROUP BY 1)),
    __qdq_rank AS (
      SELECT e.q, e.r, e.n, e.est, MAX(l.lcum) AS est_rank
      FROM __qdq_est e JOIN __qdq_leafcum l ON l.v <= e.est
      GROUP BY 1, 2, 3, 4),
    __qdq_exact AS (
      SELECT e.q, MIN(l.v) AS exact_q
      FROM __qdq_est e JOIN __qdq_leafcum l ON l.lcum >= e.r
      GROUP BY 1),
    __qdq_out AS (
      SELECT r.q, r.n, r.r, r.est, r.est_rank, x.exact_q,
        r.est_rank - r.r AS rank_err,
        (r.est_rank - r.r) * $k <= r.n * $bits AS within_bound
      FROM __qdq_rank r JOIN __qdq_exact x USING (q))"""
  }

  /** DuckDB CTE chain replaying [[hllSketch]] over `srcCte` (columns
    * grp, k0); final CTE `__hll_out` mirrors the output schema. The
    * register CTE `__hll_regs` is exposed for merge replays. */
  def hllSketchSql(srcCte: String): String =
    s"""__hll_h AS (
      SELECT grp, ${Sampling.hashValueSql("k0")} AS h
      FROM $srcCte WHERE k0 IS NOT NULL),
    __hll_regs AS (
      SELECT grp, h % $HllM AS bucket,
        CAST(MAX(CASE WHEN h >> 6 = 0 THEN $HllShift
          ELSE $HllShift - length(bin(h >> 6)) END) AS INTEGER) AS reg
      FROM __hll_h GROUP BY 1, 2),
    ${hllEstimateSql("__hll_regs", "__hll_out")}"""

  /** DuckDB replay of [[hllEstimate]] over a register CTE
    * `(grp, bucket, reg)`. */
  def hllEstimateSql(regsCte: String, out: String): String = {
    val linearList = HllLinearTable.map(dlit).mkString("[", ", ", "]")
    s"""__hll_agg_$out AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_hit,
        CAST(SUM(CAST(1 AS BIGINT) << ($HllShift - reg)) AS BIGINT)
          AS z_partial,
        array_to_string(
          list(bucket || ':' || reg ORDER BY bucket), ',') AS registers_csv
      FROM $regsCte GROUP BY 1),
    $out AS (
      SELECT grp, n_hit, v_zero, z_int,
        ROUND(CASE WHEN v_zero > 0
            AND ${dlit(HllNumerator)} / CAST(z_int AS DOUBLE)
              <= ${dlit(HllSmallRange)}
          THEN ($linearList)[CAST(v_zero AS INTEGER) + 1]
          ELSE ${dlit(HllNumerator)} / CAST(z_int AS DOUBLE) END, 6)
          AS est_hll,
        registers_csv
      FROM (
        SELECT grp, n_hit, z_partial, registers_csv,
          CAST($HllM - n_hit AS BIGINT) AS v_zero,
          z_partial + CAST($HllM - n_hit AS BIGINT)
            * (CAST(1 AS BIGINT) << $HllShift) AS z_int
        FROM __hll_agg_$out))"""
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
