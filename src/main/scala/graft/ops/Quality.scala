package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit.
  *
  * Spark stores no PK/FK/NOT NULL constraints (SURVEY §1.1: the
  * reference's fact PK (id, filename) and lga_code FK — design.sql:413–
  * 414 — are informational even in Snowflake), so a warehouse layer on
  * this engine enforces them as audit queries. The audit result is a
  * skinny (check, n_violations) frame: cheap to store per load, trivial
  * to alert on, and unioned across tables.
  *
  * Scale shape: all row-predicate checks run in ONE scan of the table
  * as a conditional aggregation (sum(when(violation,1))) — adding a
  * 20th check adds zero passes. Key-uniqueness adds one hash shuffle on
  * the key; referential integrity adds one left-anti join per FK (the
  * dim side broadcast when small). Nothing collects to the driver.
  */
object Quality {

  /** A named row-level expectation; `violation` is true when a row
    * BREAKS the rule. */
  final case class Check(name: String, violation: Column)

  /** Not-null expectation for a column. */
  def notNull(c: String): Check = Check(s"not_null_$c", col(c).isNull)

  /** Value-domain expectation (violated when outside `allowed`). */
  def inSet(c: String, allowed: Seq[String]): Check =
    Check(s"in_set_$c", col(c).isNotNull && !col(c).isin(allowed: _*))

  /** Range expectation (violated when outside [lo, hi]). */
  def inRange(c: String, lo: Column, hi: Column): Check =
    Check(s"in_range_$c", col(c).isNotNull && !col(c).between(lo, hi))

  /** All row-predicate checks in one scan → (check, n_violations). */
  def auditRows(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "auditRows: at least one check")
    // coalesce: sum over an EMPTY table is NULL, and an empty staging
    // table is exactly the failed-load case an audit must report as
    // zero-violations-but-present, not as indeterminate NULLs
    val aggs = checks.map(c =>
      coalesce(sum(when(c.violation, 1L).otherwise(0L)), lit(0L)).as(c.name))
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.unpivot(Array.empty[Column], checks.map(c => col(c.name)).toArray,
      "check", "n_violations")
  }

  /** Key-uniqueness check: rows beyond the first per key are
    * violations (the reference's PK (id, filename), design.sql:413). */
  def auditUniqueKey(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("n_violations"))
      .select(lit("unique_key_" + keys.mkString("_")).as("check"),
        col("n_violations"))

  /** One-pass numeric profiling: (column, n, n_null, min, max, mean,
    * variance) for every listed column in a SINGLE scan — the metric
    * structs ride one grand aggregate and are exploded afterwards.
    *
    * Variance comes from exact decimal (Σx, Σx²) — `stddev_samp` over
    * doubles is order-dependent under Spark's partial aggregation and
    * can never bit-match a single-threaded engine; the sums are exact
    * (values ≤2 decimal places square exactly in scale 4, precision 37
    * ≤ Spark's 38 cap), and the closing double arithmetic is the same
    * IEEE sequence on every engine. Sample variance; NULL when n < 2,
    * mean NULL when n = 0 (matching SQL aggregate semantics).
    *
    * Magnitude bound: Σ(x·100)² must fit DECIMAL(38,0) — e.g. 10⁹ rows
    * of |x| ≤ 10¹².⁵ dollars. Beyond it, ANSI mode (the Spark 4
    * default) throws at the aggregate; under non-ANSI the sum would
    * come back NULL, which the guard below turns into a loud error
    * instead of a silent NULL variance. */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileNumeric: at least one column")
    import org.apache.spark.sql.types.DecimalType
    val entries = cols.map { c =>
      // mean/variance ENTIRELY in exact integer cents until the final
      // small-magnitude division: the earlier double form cast the
      // Σx² decimal (>2^53) to double, and DuckDB's huge-decimal →
      // double conversion is off by up to 1 ulp (measured −0.25 at
      // 7e15 on sf0.1), which shifted the 6dp-rounded variance by one
      // grid step. Here the 6dp rounding itself is integer arithmetic
      // — half-away-from-zero via truncating div, the same op both
      // engines implement exactly at any magnitude — and the only
      // double conversions are of micro-unit integers (< 2^53).
      val cents = (col(c).cast(DecimalType(18, 2)) * 100)
        .cast(DecimalType(20, 0))
      val n = count(col(c))
      val s = sum(cents).cast(DecimalType(38, 0))
      val ss = sum(cents * cents).cast(DecimalType(38, 0))
      struct(
        lit(c).as("col_name"),
        n.as("n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        min(col(c)).cast("double").as("min"),
        max(col(c)).cast("double").as("max"),
        n.as("__n"), s.as("__s"), ss.as("__ss"))
    }
    df.agg(array(entries: _*).as("__p"))
      .select(explode(col("__p")).as("r")).select(col("r.*"))
      .withColumn("mean",
        when(col("__n") > 0, expr(
          "CAST((2 * __s * 10000 + (CASE WHEN __s >= 0 THEN __n ELSE -__n END))" +
            " div (2 * __n) AS DOUBLE) / 1e6")))
      .withColumn("variance",
        when(col("__n") > 1,
          // non-ANSI overflow guard (see Scaladoc): a NULL exact sum
          // with rows present means DECIMAL(38,0) overflowed silently
          when(col("__s").isNull || col("__ss").isNull, raise_error(concat(
            lit("profileNumeric: exact sum overflowed DECIMAL(38,0) for "),
            col("col_name"))).cast("double"))
          .otherwise(expr(
            "CAST((2 * (__n * __ss - __s * __s) * 100 + (__n * (__n - 1)))" +
              " div (2 * __n * (__n - 1)) AS DOUBLE) / 1e6"))))
      .drop("__n", "__s", "__ss")
  }

  /** Equi-width histogram of a numeric column: one hash aggregate on
    * the bucket id. `width_bucket` semantics (shared with DuckDB):
    * bucket 0 below `lo`, `nBuckets`+1 at/above `hi`, NULLs dropped.
    * Dense output — empty buckets surface as 0 rows via a sequence
    * join, so downstream charting/drift-compare never misses a bin. */
  def histogram(df: DataFrame, c: String, lo: Double, hi: Double,
                nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo, "histogram: need hi > lo, nBuckets > 0")
    val counts = df.filter(col(c).isNotNull)
      .groupBy(width_bucket(col(c).cast("double"), lit(lo), lit(hi),
        lit(nBuckets)).as("bucket"))
      .agg(count(lit(1)).as("n_rows"))
    val allBuckets = df.sparkSession.range(0, nBuckets + 2)
      .select(col("id").cast("long").as("bucket"))
    allBuckets.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"))
  }

  /** k-anonymity audit (Sweeney 2002): equivalence classes of the
    * quasi-identifier tuple smaller than `k` re-identify their members.
    * Returns only the VIOLATING classes — the QI columns, the class
    * size, and the re-identification risk `1/size` fixed-pointed to
    * integer micro-units so the value hash-matches across engines
    * (1e6/size is one exact double division both ways, but emitting the
    * rounded integer removes even formatting ambiguity).
    *
    * Scale shape: one map-side-combinable COUNT keyed by the QI tuple —
    * the same plan as any groupBy — then a filter on the aggregate. A
    * 100 TB table audits in a single shuffle whose key domain is the QI
    * cross-product, not the row count; hot (large, SAFE) classes
    * collapse map-side and are then filtered out, so output is bounded
    * by the number of small classes. */
  def kAnonymityViolations(df: DataFrame, qis: Seq[Column], k: Int): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    df.groupBy(qis: _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
      .withColumn("risk_micro",
        round(lit(1e6) / col("class_size")).cast("long"))
  }

  /** l-diversity violations (Machanavajjhala et al. 2007) — the audit
    * k-anonymity is NOT sufficient for: a QI class can be large yet
    * carry a single sensitive value, so membership alone discloses it
    * (the homogeneity attack). Flags QI classes with fewer than `l`
    * distinct sensitive values, with the class size and the dominant
    * value's share (the disclosure probability an attacker gets by
    * guessing the mode) in integer micro-units.
    *
    * NULL sensitive values form their own diversity class on both
    * engines (GROUP BY semantics), deliberately: "value missing" is
    * itself disclosable. Scale shape: two combinable aggregates —
    * (QI, sensitive) cells, then per-class rollup — output bounded by
    * the violating-class count, never a window. */
  def lDiversityViolations(df: DataFrame, qis: Seq[String],
                           sensitive: Column, l: Int): DataFrame = {
    require(l >= 2, s"l-diversity needs l >= 2, got $l")
    val cells = df.groupBy(qis.map(col) :+ sensitive.as("__s"): _*)
      .agg(count(lit(1)).as("__c"))
    cells.groupBy(qis.map(col): _*)
      .agg(sum(col("__c")).cast("long").as("class_size"),
        count(lit(1)).as("distinct_sensitive"),
        max(col("__c")).as("__mx"))
      .withColumn("max_share_micro",
        round(col("__mx").cast("double") / col("class_size").cast("double")
          * 1e6).cast("long"))
      .drop("__mx")
      .filter(col("distinct_sensitive") < l)
  }

  /** MAD robust outlier audit — the outlier detector that survives its
    * own outliers: mean/stddev z-scores are dragged by the very points
    * they should flag (masking), while median and MAD
    * (median absolute deviation, Hampel 1974) have a 50% breakdown
    * point. Per group: med = median(x), MAD = median(|x − med|),
    * robust z = |x − med| / (1.4826·MAD) (1.4826 ≈ 1/Φ⁻¹(¾) scales MAD
    * to σ under normality — the standard consistency constant, embedded
    * as the same literal in the oracle), outlier ⇔ z > `cut` (Hampel's
    * 3.5 default). Emits a per-group summary: size, med, MAD, outlier
    * count, and the worst z — bounded by |groups|, not rows.
    * A zero MAD (over half the group identical) yields NULL z — no
    * spread to scale by, mirroring the winsorize IQR=0 contract.
    *
    * Scale shape: two exact per-group medians (each materializes the
    * group's values once — the documented exact-percentile trade; the
    * KLL `approx_percentile` is the drop-in for high-cardinality
    * groups), then the stats broadcast back onto the row stream so the
    * flagging pass is map-side. */
  def madOutliers(df: DataFrame, group: Column, value: Column,
                  cut: Double = 3.5): DataFrame = {
    val rows = df.select(group.as("grp"), value.cast("double").as("x"))
      .filter(col("x").isNotNull)
    val meds = rows.groupBy(col("grp"))
      .agg(percentile(col("x"), lit(0.5)).as("med"))
    val withDev = rows.join(broadcast(meds), Seq("grp"))
      .withColumn("dev", abs(col("x") - col("med")))
    val mads = withDev.groupBy(col("grp"))
      .agg(percentile(col("dev"), lit(0.5)).as("mad"), first(col("med")).as("med"))
    withDev.drop("med").join(broadcast(mads), Seq("grp"))
      .withColumn("z", when(col("mad") > 0,
        col("dev") / (lit(1.4826) * col("mad"))))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        round(first(col("med")), 6).as("med"),
        round(first(col("mad")), 6).as("mad"),
        count(when(col("z") > cut, lit(1))).as("n_outliers"),
        round(max(col("z")), 6).as("max_z"))
  }

  /** DuckDB replay of [[madOutliers]] over `srcCte` (columns grp, x). */
  def madOutliersSql(srcCte: String, cut: Double = 3.5): String =
    s"""__mad_rows AS (
      SELECT grp, CAST(x AS DOUBLE) AS x FROM $srcCte WHERE x IS NOT NULL),
    __mad_med AS (
      SELECT grp, percentile_cont(0.5) WITHIN GROUP (ORDER BY x) AS med
      FROM __mad_rows GROUP BY 1),
    __mad_dev AS (
      SELECT r.grp, r.x, m.med, abs(r.x - m.med) AS dev
      FROM __mad_rows r JOIN __mad_med m USING (grp)),
    __mad_mad AS (
      SELECT grp, percentile_cont(0.5) WITHIN GROUP (ORDER BY dev) AS mad
      FROM __mad_dev GROUP BY 1),
    __mad_out AS (
      SELECT d.grp, CAST(COUNT(*) AS BIGINT) AS n,
        ROUND(ANY_VALUE(d.med), 6) AS med, ROUND(ANY_VALUE(s.mad), 6) AS mad,
        CAST(COUNT(CASE WHEN
          CASE WHEN s.mad > 0
            THEN d.dev / (CAST('1.4826' AS DOUBLE) * s.mad) END
          > CAST('${java.lang.Double.toString(cut)}' AS DOUBLE)
          THEN 1 END) AS BIGINT) AS n_outliers,
        ROUND(MAX(CASE WHEN s.mad > 0
          THEN d.dev / (CAST('1.4826' AS DOUBLE) * s.mad) END), 6) AS max_z
      FROM __mad_dev d JOIN __mad_mad s USING (grp)
      GROUP BY 1)"""

  /** Population Stability Index — THE model-monitoring drift metric
    * (credit-risk lineage, now standard for feature/score drift):
    * PSI = Σ_bins (p_cur − p_ref)·ln(p_cur/p_ref), with the usual
    * reading (<0.1 stable, 0.1–0.25 shifting, >0.25 drifted). Extends
    * the delta-based `x_dq_drift` with the information-theoretic form
    * (symmetrized KL) that weights a bin's shift by its log-ratio.
    *
    * Exactness discipline: bin shares come from exact integer counts;
    * each bin's term is micro-quantized — round(term·1e6) — the same
    * libm-pinning as BM25's idf, so the integer SUM is
    * order-independent and engine-replayable. A bin empty on either
    * side has no defined log-ratio: its term is NULL (excluded from
    * the sum) and the bin is flagged, rather than the epsilon-fudge
    * that makes PSI silently depend on a chosen epsilon.
    *
    * Scale shape: two combinable histogram aggregates (one per
    * period, map-side collapsed), a |bins|-row full-outer join, and a
    * 1-row reduce broadcast back — nothing corpus-sized after the
    * scans. Output: one row per bin (counts, term) plus the total
    * `psi_micro` and degenerate-bin count on every row. */
  def psiDrift(ref: DataFrame, cur: DataFrame, value: Column,
               lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 2 && hi > lo, s"bad psi shape [$lo,$hi) x $nBins")
    val width = (hi - lo) / nBins
    def binned(df: DataFrame, cnt: String) =
      df.select(value.cast("double").as("x")).filter(col("x").isNotNull)
        .withColumn("bin", least(greatest(
          floor((col("x") - lit(lo)) / lit(width)).cast("long"), lit(0L)),
          lit(nBins - 1L)))
        .groupBy(col("bin")).agg(count(lit(1)).as(cnt))
    val joined = binned(ref, "c_ref").join(binned(cur, "c_cur"), Seq("bin"),
        "full_outer")
      .select(col("bin"), coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"))
    val tot = joined.agg(sum(col("c_ref")).cast("long").as("n_ref"),
      sum(col("c_cur")).cast("long").as("n_cur"))
    val terms = joined.crossJoin(broadcast(tot))
      .withColumn("term_micro",
        when(col("c_ref") > 0 && col("c_cur") > 0, round(
          (col("c_cur").cast("double") / col("n_cur").cast("double")
            - col("c_ref").cast("double") / col("n_ref").cast("double"))
            * log((col("c_cur").cast("double") * col("n_ref").cast("double"))
              / (col("c_ref").cast("double") * col("n_cur").cast("double")))
            * lit(1e6)).cast("long")))
      .localCheckpoint(true) // feeds both the total reduce and the output
    val total = terms.agg(sum(col("term_micro")).as("psi_micro"),
      count(when(col("term_micro").isNull, lit(1))).as("n_degenerate_bins"))
    terms.crossJoin(broadcast(total))
      .select(col("bin"), col("c_ref"), col("c_cur"), col("term_micro"),
        col("psi_micro"), col("n_degenerate_bins"))
  }

  /** DuckDB replay of [[psiDrift]] over `refCte`/`curCte` (one column
    * x each); final CTE `__psi_out`. */
  def psiDriftSql(refCte: String, curCte: String,
                  lo: Double, hi: Double, nBins: Int): String = {
    val width = (hi - lo) / nBins
    def wlit(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    def binned(src: String, cnt: String) =
      s"""(SELECT LEAST(GREATEST(CAST(floor((CAST(x AS DOUBLE) - ${wlit(lo)})
            / ${wlit(width)}) AS BIGINT), 0), ${nBins - 1}) AS bin,
          CAST(COUNT(*) AS BIGINT) AS $cnt
        FROM $src WHERE x IS NOT NULL GROUP BY 1)"""
    s"""__psi_j AS (
      SELECT COALESCE(r.bin, c.bin) AS bin,
        COALESCE(r.c_ref, 0) AS c_ref, COALESCE(c.c_cur, 0) AS c_cur
      FROM ${binned(refCte, "c_ref")} r
      FULL OUTER JOIN ${binned(curCte, "c_cur")} c ON r.bin = c.bin),
    __psi_tot AS (
      SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref,
        CAST(SUM(c_cur) AS BIGINT) AS n_cur FROM __psi_j),
    __psi_terms AS (
      SELECT bin, c_ref, c_cur,
        CASE WHEN c_ref > 0 AND c_cur > 0 THEN
          CAST(ROUND((CAST(c_cur AS DOUBLE) / CAST(n_cur AS DOUBLE)
            - CAST(c_ref AS DOUBLE) / CAST(n_ref AS DOUBLE))
            * ln((CAST(c_cur AS DOUBLE) * CAST(n_ref AS DOUBLE))
              / (CAST(c_ref AS DOUBLE) * CAST(n_cur AS DOUBLE)))
            * 1000000) AS BIGINT) END AS term_micro
      FROM __psi_j CROSS JOIN __psi_tot),
    __psi_out AS (
      SELECT bin, c_ref, c_cur, term_micro,
        (SELECT CAST(SUM(term_micro) AS BIGINT) FROM __psi_terms)
          AS psi_micro,
        (SELECT CAST(COUNT(CASE WHEN term_micro IS NULL THEN 1 END)
          AS BIGINT) FROM __psi_terms) AS n_degenerate_bins
      FROM __psi_terms)"""
  }

  /** Train/test split leakage audit — the hygiene check a temporal (or
    * any) split runs before training: entity overlap between the
    * splits. Random row-level splits leak ENTITIES across the boundary
    * (the same user's behavior in both train and test inflates every
    * user-level metric); this measures it instead of assuming it away:
    * distinct keys per split, overlapping keys, the share of test keys
    * already seen in train, and the count of test ROWS carrying a
    * leaked key (micro-quantized shares from exact counts).
    *
    * Scale shape: two distinct aggregates + one semi-join keyed by the
    * entity — all combinable, output is one row. */
  def splitLeakage(train: DataFrame, test: DataFrame, key: Column): DataFrame = {
    val tr = train.select(key.as("k")).filter(col("k").isNotNull)
      .distinct().localCheckpoint(true) // feeds the count and both joins
    val te = test.select(key.as("k")).filter(col("k").isNotNull)
      .localCheckpoint(true)
    val teKeys = te.distinct()
    val overlap = teKeys.join(tr, Seq("k"), "left_semi")
    val leakedRows = te.join(tr, Seq("k"), "left_semi")
    tr.agg(count(lit(1)).as("n_train_keys"))
      .crossJoin(broadcast(teKeys.agg(count(lit(1)).as("n_test_keys"))))
      .crossJoin(broadcast(overlap.agg(count(lit(1)).as("n_overlap_keys"))))
      .crossJoin(broadcast(te.agg(count(lit(1)).as("n_test_rows"))))
      .crossJoin(broadcast(leakedRows.agg(count(lit(1)).as("n_test_rows_leaked"))))
      .withColumn("overlap_micro",
        when(col("n_test_keys") > 0, round(
          col("n_overlap_keys").cast("double")
            / col("n_test_keys").cast("double") * lit(1e6)).cast("long")))
      .withColumn("leaked_rows_micro",
        when(col("n_test_rows") > 0, round(
          col("n_test_rows_leaked").cast("double")
            / col("n_test_rows").cast("double") * lit(1e6)).cast("long")))
  }

  /** DuckDB replay of [[splitLeakage]] over `trainCte`/`testCte` (one
    * column k each); final CTE `__leak_out`. */
  def splitLeakageSql(trainCte: String, testCte: String): String =
    s"""__leak_tr AS (
      SELECT DISTINCT k FROM $trainCte WHERE k IS NOT NULL),
    __leak_te AS (SELECT k FROM $testCte WHERE k IS NOT NULL),
    __leak_out AS (
      SELECT n_train_keys, n_test_keys, n_overlap_keys, n_test_rows,
        n_test_rows_leaked,
        CASE WHEN n_test_keys > 0 THEN CAST(ROUND(
          CAST(n_overlap_keys AS DOUBLE) / CAST(n_test_keys AS DOUBLE)
            * 1000000) AS BIGINT) END AS overlap_micro,
        CASE WHEN n_test_rows > 0 THEN CAST(ROUND(
          CAST(n_test_rows_leaked AS DOUBLE) / CAST(n_test_rows AS DOUBLE)
            * 1000000) AS BIGINT) END AS leaked_rows_micro
      FROM (
        SELECT
          (SELECT CAST(COUNT(*) AS BIGINT) FROM __leak_tr) AS n_train_keys,
          (SELECT CAST(COUNT(DISTINCT k) AS BIGINT) FROM __leak_te)
            AS n_test_keys,
          (SELECT CAST(COUNT(DISTINCT t.k) AS BIGINT) FROM __leak_te t
            SEMI JOIN __leak_tr r ON t.k = r.k) AS n_overlap_keys,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM __leak_te) AS n_test_rows,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM __leak_te t
            SEMI JOIN __leak_tr r ON t.k = r.k) AS n_test_rows_leaked))"""

  /** Differentially-private counts under the (truncated) GEOMETRIC
    * mechanism (Ghosh, Roughgarden & Sundararajan 2009 — the discrete
    * analogue of Laplace, and the utility-optimal mechanism for count
    * queries): per group, count + K where
    * P(K = k) ∝ α^|k|, α = e^−ε, truncated to [−B, B].
    *
    * The noise draw is by INVERSE CDF over the engine-portable hash:
    * u = hash56(seed ‖ group) ∈ [0, 2⁵⁶) compared against the CDF
    * thresholds t_k = ⌊CDF(k)·2⁵⁶⌋, which are computed ONCE in Scala
    * and embedded as long literals in both engines — so the sampling
    * is pure integer comparison, no transcendental is ever evaluated
    * per-engine, and the entire mechanism replays bit-exactly (the
    * point here: DP pipelines need replayable unit tests of the
    * mechanism; a DEPLOYMENT swaps the public seed for a secret one
    * and drops the diagnostic columns, changing no plan shape).
    * Released counts are clamped at 0 (post-processing, ε-free).
    *
    * Scale shape: one combinable count keyed by the group, then
    * row-local noise arithmetic on the |groups|-bounded frame. */
  def dpNoisyCounts(df: DataFrame, groupCols: Seq[Column], eps: Double,
                    b: Int = 16, seed: String = "dp"): DataFrame = {
    val (thresholds, _) = dpGeomThresholds(eps, b)
    // materialize the group exprs under their output names first, so the
    // per-group noise key is built from the POST-aggregation columns
    val named = df.select(groupCols: _*)
    val names = named.columns.toSeq
    val key = concat_ws("|",
      (lit(seed) +: names.map(col(_).cast("string"))): _*)
    val u = Sampling.hashValue(key)
    // ascending CASE chain over the 2B precomputed thresholds
    val noise = thresholds.foldRight(lit(b)) {
      case ((t, k), acc) => when(u < t, lit(k)).otherwise(acc)
    }
    named.groupBy(names.map(col): _*)
      .agg(count(lit(1)).as("n_true"))
      .withColumn("noise", noise)
      .withColumn("n_noisy", greatest(col("n_true") + col("noise"), lit(0L)))
  }

  /** CDF thresholds of the two-sided geometric in 2⁵⁶-integer u-space:
    * pairs (t_k, k) for k = −B..B−1, ascending; u ≥ last ⇒ k = B. */
  def dpGeomThresholds(eps: Double, b: Int): (Seq[(Long, Int)], Double) = {
    require(eps > 0 && b >= 1, s"need eps > 0, B >= 1; got $eps, $b")
    val alpha = math.exp(-eps)
    def cdf(k: Int): Double =
      if (k < 0) math.pow(alpha, -k) / (1 + alpha)
      else 1 - math.pow(alpha, k + 1) / (1 + alpha)
    val two56 = math.pow(2, 56)
    ((-b until b).map(k => (math.floor(cdf(k) * two56).toLong, k)), alpha)
  }

  /** DuckDB replay of [[dpNoisyCounts]] over `srcCte`, grouping by
    * `groupExprs` (select-list exprs, also used for GROUP BY); final
    * CTE `__dp_out` = groups + n_true, noise, n_noisy. */
  def dpNoisyCountsSql(srcCte: String, groupExprs: Seq[String], eps: Double,
                       b: Int = 16, seed: String = "dp"): String = {
    val (thresholds, _) = dpGeomThresholds(eps, b)
    val key = (s"'$seed'" +: groupExprs.map(g => s"CAST($g AS VARCHAR)"))
      .mkString(" || '|' || ")
    val cases = thresholds
      .map { case (t, k) => s"WHEN u < $t THEN $k" }
      .mkString("\n        ")
    val gs = groupExprs.mkString(", ")
    s"""__dp_cnt AS (
      SELECT $gs, CAST(COUNT(*) AS BIGINT) AS n_true,
        ${Sampling.hashValueSql(key)} AS u
      FROM $srcCte GROUP BY ${(1 to groupExprs.size).mkString(", ")}),
    __dp_out AS (
      SELECT $gs, n_true,
        (CASE $cases ELSE $b END) AS noise,
        GREATEST(n_true + (CASE $cases ELSE $b END), 0) AS n_noisy
      FROM __dp_cnt)"""
  }

  /** Order-independent grouped table checksum — migration/replication
    * validation (the per-partition check a 100 TB copy job runs instead
    * of comparing rows): md5-56 of the caller's canonical row rendering,
    * summed per group in DECIMAL(38) (order-free; no overflow below
    * ~1e80-row groups), reduced mod 2⁶² to a BIGINT. Checksums agree iff
    * the row multisets agree (up to hash collisions) — regardless of
    * partitioning, ordering, or file layout. Callers must render floats
    * deliberately (engine-specific formatting) or exclude them. */
  def tableChecksum(df: DataFrame, group: Seq[String],
                    canonical: Column): DataFrame =
    df.select(group.map(col) :+
        Sampling.hashValue(canonical)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("__h"): _*)
      .groupBy(group.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__h")) % lit(BigDecimal(4611686018427387904L)))
          .cast("long").as("checksum"))

  /** Referential integrity: fact keys with no matching dimension row
    * (NULL FKs are not violations, matching SQL FK semantics). */
  def auditForeignKey(fact: DataFrame, factKey: String,
                      dim: DataFrame, dimKey: String,
                      broadcastDim: Boolean = true): DataFrame = {
    val d = dim.select(col(dimKey)).distinct()
    val dimSide = if (broadcastDim) broadcast(d) else d
    fact.filter(col(factKey).isNotNull)
      .join(dimSide, col(factKey) === col(dimKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(s"fk_${factKey}_to_$dimKey").as("check"),
        col("n_violations"))
  }
}
