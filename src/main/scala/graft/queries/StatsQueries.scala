package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Stats

/** Distribution-comparison statistics and dataset-integrity audits —
  * the hypothesis-test tier a data platform runs between ingest and
  * release: "did this month's distribution shift?" (two-sample
  * Kolmogorov–Smirnov, Mann–Whitney U), "when did the series break?"
  * (CUSUM changepoint), and "do the keys still join?" (referential-
  * integrity orphan audit).
  *
  * Scale discipline shared by the test statistics: raw values are
  * first quantized onto a FIXED bounded grid (integer cents → 4096
  * equal-width bins over an embedded range), so the only corpus-sized
  * operation is one combinable per-bin count aggregate. Every
  * cumulative window then runs over the ≤4096-row bin frame — bounded
  * at any corpus size (the q-digest precedent), never over rows. The
  * statistics are computed EXACTLY for the binned distributions
  * (integer arithmetic end-to-end; doubles only in the final emit via
  * identical IEEE expression trees on both engines), which is the
  * honest distributed form: an exact-rank KS/U over raw doubles needs
  * a global sort of the corpus, and the binned statistic differs from
  * it by at most the largest bin mass.
  */
object StatsQueries {

  /** Equal-width bin over [0, MAX_CENTS) with clamp-to-top, from the
    * exact integer cents of the value — INTEGER division on both
    * engines (Spark SQL `DIV` / DuckDB `//`; never Column `/`, which
    * is true division to double — the x_embed_gram lesson). */
  private val BINS = 4096
  private val MAX_CENTS = 60000000L // $600k — above any o_totalprice
  private def binExpr(e: String): Column = expr(
    s"LEAST(CAST(ROUND(CAST($e AS DOUBLE) * 100, 0) AS BIGINT)" +
      s" * $BINS DIV $MAX_CENTS, ${BINS - 1})")
  private def binSql(e: String): String =
    s"LEAST(CAST(ROUND(CAST($e AS DOUBLE) * 100, 0) AS BIGINT)" +
      s" * $BINS // $MAX_CENTS, ${BINS - 1})"

  /** The two market segments every A/B-shaped stat query in the suite
    * compares (x_stat_ttest's split) — KS/U here are the
    * NONPARAMETRIC complements of that t-test. */
  private def segPoints(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select((col("c_mktsegment") === "BUILDING").as("is_a"),
        binExpr("o_totalprice").as("b"))

  private val segPointsSql =
    s"""SELECT c_mktsegment = 'BUILDING' AS is_a,
      ${binSql("o_totalprice")} AS b
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')"""

  // ---------------------------------------------------------------
  // x_stat_ks_test
  // ---------------------------------------------------------------

  /** Two-sample Kolmogorov–Smirnov D between the BUILDING and
    * MACHINERY order-value distributions.
    *
    * D = max over bin edges of |F̂_A − F̂_B| is kept as the EXACT
    * integer numerator max|cumA·n2 − cumB·n1| (argmax bin reported,
    * first on ties) and only divided out by n1·n2 at the emit — no
    * float comparison anywhere in the reduction, so the answer is
    * bit-deterministic under any partitioning. The 95% rejection bar
    * is the asymptotic c(0.05)=1.358 · √((n1+n2)/(n1·n2)); both sides
    * build it from the same integer inputs with the same IEEE tree.
    *
    * Scale shape: ONE combinable per-bin count aggregate over the
    * corpus, then all windows/maxes run on the ≤4096-row bin frame.
    * (The BIGINT numerator cum·n is exact up to ~3·10⁹ rows per
    * sample; past that, cast the two cum×n products to DECIMAL(38,0)
    * on both engines — a one-line widening, same argmax.) */
  private val x_stat_ks_test = Q(
    "x_stat_ks_test",
    (s, d) => Stats.ksBinned(segPoints(s, d)),
    Some(s"""WITH pts AS ($segPointsSql),
      per_bin AS (
        SELECT b,
          CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
          CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS nb
        FROM pts GROUP BY 1),
      cum AS (
        SELECT b,
          CAST(SUM(na) OVER (ORDER BY b) AS BIGINT) AS ca,
          CAST(SUM(nb) OVER (ORDER BY b) AS BIGINT) AS cb
        FROM per_bin),
      tot AS (
        SELECT CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n2
        FROM pts),
      scored AS (
        SELECT n1, n2, b, abs(ca * n2 - cb * n1) AS dnum
        FROM cum CROSS JOIN tot),
      agg AS (
        SELECT n1, n2, CAST(MAX(dnum) AS BIGINT) AS d_num
        FROM scored GROUP BY 1, 2),
      at AS (
        SELECT CAST(MIN(b) AS BIGINT) AS d_at_bin
        FROM scored JOIN agg USING (n1, n2) WHERE dnum = d_num)
      SELECT n1, n2, d_num, d_at_bin,
        ROUND(CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS d,
        CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)
          > CAST('1.358' AS DOUBLE)
            * sqrt(CAST(n1 + n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2))
          AS significant
      FROM agg CROSS JOIN at"""))

  // ---------------------------------------------------------------
  // x_stat_mannwhitney
  // ---------------------------------------------------------------

  /** Mann–Whitney U (Wilcoxon rank-sum) between the same two
    * segments, midranks over the shared bin grid, tie-corrected
    * normal approximation.
    *
    * U1 is carried DOUBLED so midrank halves stay integral:
    * U1×2 = Σ_b na_b · (2·cumB_before(b) + nb_b), an exact BIGINT.
    * The tie-corrected variance uses Σ(t³−t) over bin totals t —
    * again exact integers; z is finalized once in double (identical
    * IEEE tree both engines) and rounded. Same scale shape as the KS
    * query: one corpus-sized combinable count, bounded-frame windows
    * after. (The t³ tie term is BIGINT-exact up to ~2M rows per bin —
    * i.e. ~8·10⁹ total at 4096 bins; past that, widen the tie sum to
    * DECIMAL(38,0) on both engines.) */
  private val x_stat_mannwhitney = Q(
    "x_stat_mannwhitney",
    (s, d) => Stats.mannWhitneyBinned(segPoints(s, d)),
    Some(s"""WITH pts AS ($segPointsSql),
      per_bin AS (
        SELECT b,
          CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
          CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS nb
        FROM pts GROUP BY 1),
      ranked AS (
        SELECT b, na, nb,
          CAST(COALESCE(SUM(nb) OVER (ORDER BY b
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS cb_less
        FROM per_bin),
      stx AS (
        SELECT CAST(SUM(na) AS BIGINT) AS n1, CAST(SUM(nb) AS BIGINT) AS n2,
          CAST(SUM(na * (cb_less * 2 + nb)) AS BIGINT) AS u1_x2,
          CAST(SUM((na + nb) * (na + nb) * (na + nb) - (na + nb))
            AS BIGINT) AS tie_t
        FROM ranked),
      fin AS (
        SELECT n1, n2, u1_x2, tie_t,
          CAST(n1 + n2 AS DOUBLE) AS nn,
          CAST(n1 * n2 AS DOUBLE) AS mu_x2,
          CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
            * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
              - CAST(tie_t AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE)
                * (CAST(n1 + n2 AS DOUBLE) - 1.0))) AS var_u
        FROM stx)
      SELECT n1, n2, u1_x2, tie_t,
        ROUND(CASE WHEN var_u > 0
          THEN (CAST(u1_x2 AS DOUBLE) - mu_x2) / 2.0 / sqrt(var_u)
          ELSE 0.0 END, 6) AS z,
        abs(CASE WHEN var_u > 0
          THEN (CAST(u1_x2 AS DOUBLE) - mu_x2) / 2.0 / sqrt(var_u)
          ELSE 0.0 END) > CAST('1.96' AS DOUBLE) AS significant
      FROM fin"""))

  // ---------------------------------------------------------------
  // x_stat_cusum_changepoint
  // ---------------------------------------------------------------

  /** CUSUM changepoint detection on the per-event-type daily count
    * series — "which day did this metric's level shift?"
    *
    * The cumulative deviation S_t = Σ_{i≤t}(x_i − x̄) is carried as
    * the EXACT scaled integer S_t·n = n·cum_t − t·total (no fraction,
    * no float drift); the changepoint is argmax |S_t·n| (earliest day
    * on ties) and the normalized magnitude only divides out at the
    * emit. Scale shape: the corpus collapses to one (type, day) count
    * aggregate; every window after runs per-type over the
    * calendar-bounded day frame. */
  private val x_stat_cusum_changepoint = Q(
    "x_stat_cusum_changepoint",
    (s, d) => Stats.cusumChangepoint(
      Tables.events(s, d)
        .filter(col("ts").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))),
    Some("""WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2),
      scored AS (
        SELECT event_type, day, cnt,
          CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
            AS BIGINT) AS t,
          CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY day)
            AS BIGINT) AS cum,
          CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
          CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS total
        FROM daily),
      dev AS (
        SELECT event_type, day, n_days, total,
          n_days * cum - t * total AS s_scaled
        FROM scored)
      SELECT event_type, n_days, total,
        MIN(day) FILTER (WHERE abs(s_scaled) = m.s_abs_max) AS cp_day,
        m.s_abs_max AS s_abs_max,
        ROUND(CAST(m.s_abs_max AS DOUBLE) / n_days, 6) AS s_max
      FROM dev JOIN (
        SELECT event_type AS et, CAST(MAX(abs(s_scaled)) AS BIGINT)
          AS s_abs_max
        FROM dev GROUP BY 1) m ON event_type = m.et
      GROUP BY 1, 2, 3, 5"""))

  // ---------------------------------------------------------------
  // x_stat_anova
  // ---------------------------------------------------------------

  /** One-way ANOVA F across ALL five market segments' order values —
    * the k-group generalization of x_stat_ttest, shipped as pure
    * sufficient statistics: per group (n, Σy, Σy²) in exact integer
    * cents (Σy² summed in DECIMAL(38,0) on the Spark side / HUGEINT
    * in DuckDB — cents² overflows BIGINT at corpus scale), then
    * SST = Σy²−(Σy)²/N, SSB = Σ_g(Σy_g)²/n_g − (Σy)²/N, SSW = SST−SSB
    * and F = (SSB/(k−1))/(SSW/(N−k)) finalized once in double via
    * identical IEEE trees. η² = SSB/SST is the effect size; the 5%
    * bar for df₁ = 4 at large df₂ is the embedded literal 2.372.
    *
    * Scale shape: one combinable per-group aggregate over the corpus,
    * then the 5-row group frame folds to one row. */
  private val x_stat_anova = Q(
    "x_stat_anova",
    (s, d) => {
      val pts = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          expr("CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100, 0)" +
            " AS BIGINT)").as("y"))
      val grp = pts.groupBy(col("seg")).agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("sy"),
        sum(col("y").cast("decimal(38,0)") * col("y").cast("decimal(38,0)"))
          .as("syy"))
      grp.agg(
        count(lit(1)).as("k"), sum(col("n")).as("n_total"),
        sum(col("sy")).as("sy_all"),
        sum(col("syy")).as("syy_all"),
        sum(col("sy").cast("double") * col("sy").cast("double")
          / col("n").cast("double")).as("ssb_raw"))
        .withColumn("gm2",
          col("sy_all").cast("double") * col("sy_all").cast("double")
            / col("n_total").cast("double"))
        .withColumn("sst", col("syy_all").cast("double") - col("gm2"))
        .withColumn("ssb", col("ssb_raw") - col("gm2"))
        .withColumn("ssw", col("sst") - col("ssb"))
        .withColumn("f",
          (col("ssb") / (col("k") - 1).cast("double"))
            / (col("ssw") / (col("n_total") - col("k")).cast("double")))
        .select(col("k"), col("n_total"),
          round(col("f"), 6).as("f"),
          round(col("ssb") / col("sst"), 6).as("eta2"),
          (col("f") > lit(2.372)).as("significant"))
    },
    Some("""WITH pts AS (
        SELECT c_mktsegment AS seg,
          CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100, 0) AS BIGINT) AS y
        FROM orders JOIN customer ON o_custkey = c_custkey),
      grp AS (
        SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(y) AS BIGINT) AS sy,
          SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
        FROM pts GROUP BY 1),
      agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
          CAST(SUM(n) AS BIGINT) AS n_total,
          CAST(SUM(sy) AS BIGINT) AS sy_all,
          CAST(SUM(syy) AS DOUBLE) AS syy_all,
          SUM(CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
            AS ssb_raw
        FROM grp),
      fin AS (
        SELECT k, n_total, syy_all, ssb_raw,
          CAST(sy_all AS DOUBLE) * CAST(sy_all AS DOUBLE)
            / CAST(n_total AS DOUBLE) AS gm2
        FROM agg),
      fin2 AS (
        SELECT k, n_total,
          syy_all - gm2 AS sst, ssb_raw - gm2 AS ssb,
          (syy_all - gm2) - (ssb_raw - gm2) AS ssw
        FROM fin)
      SELECT k, n_total,
        ROUND((ssb / CAST(k - 1 AS DOUBLE))
          / (ssw / CAST(n_total - k AS DOUBLE)), 6) AS f,
        ROUND(ssb / sst, 6) AS eta2,
        (ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n_total - k AS DOUBLE))
          > CAST('2.372' AS DOUBLE) AS significant
      FROM fin2"""))

  // ---------------------------------------------------------------
  // x_dq_ref_integrity
  // ---------------------------------------------------------------

  /** Referential-integrity audit over the star schema's five FK
    * relations — the "do the keys still join?" check a release gate
    * runs before publishing. Per relation: row count, NULL-FK count,
    * and orphan count (non-NULL FK with no dimension match), with the
    * orphan rate as exact integer ppm.
    *
    * Scale shape: each relation is one shuffle join of the fact FK
    * against the DISTINCT dimension keys (the projection is one
    * column, so the shuffle moves keys only; small dims broadcast via
    * AQE) folded into a combinable 1-row count aggregate — never an
    * orphan-row materialization. */
  private val x_dq_ref_integrity = Q(
    "x_dq_ref_integrity",
    (s, d) => {
      def audit(rel: String, fact: DataFrame, fk: String,
                dim: DataFrame, pk: String): DataFrame = {
        val keys = dim.select(col(pk).as("__pk")).distinct()
        fact.select(col(fk).as("__fk"))
          .join(keys, col("__fk") === col("__pk"), "left")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("__fk").isNull, 1L).otherwise(0L)).as("n_null"),
            sum(when(col("__fk").isNotNull && col("__pk").isNull, 1L)
              .otherwise(0L)).as("n_orphan"))
          .select(lit(rel).as("relation"), col("n_rows"), col("n_null"),
            col("n_orphan"),
            expr("n_orphan * 1000000 DIV n_rows").as("orphan_ppm"))
      }
      val li = Tables.lineitem(s, d)
      audit("lineitem.orderkey->orders", li, "l_orderkey",
          Tables.orders(s, d), "o_orderkey")
        .unionAll(audit("lineitem.partkey->part", li, "l_partkey",
          Tables.part(s, d), "p_partkey"))
        .unionAll(audit("lineitem.suppkey->supplier", li, "l_suppkey",
          Tables.supplier(s, d), "s_suppkey"))
        .unionAll(audit("orders.custkey->customer", Tables.orders(s, d),
          "o_custkey", Tables.customer(s, d), "c_custkey"))
        .unionAll(audit("events.user_id->customer", Tables.events(s, d),
          "user_id", Tables.customer(s, d), "c_custkey"))
    },
    Some((Seq(
      ("lineitem.orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      ("lineitem.partkey->part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      ("lineitem.suppkey->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      ("orders.custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      ("events.user_id->customer", "events", "user_id",
        "customer", "c_custkey"))
      .map { case (rel, fact, fk, dim, pk) =>
        s"""SELECT '$rel' AS relation,
          CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(SUM(CASE WHEN f.$fk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_null,
          CAST(SUM(CASE WHEN f.$fk IS NOT NULL AND k.__pk IS NULL
            THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan,
          CAST(SUM(CASE WHEN f.$fk IS NOT NULL AND k.__pk IS NULL
            THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS orphan_ppm
        FROM $fact f LEFT JOIN
          (SELECT DISTINCT $pk AS __pk FROM $dim) k ON f.$fk = k.__pk"""
      }.mkString("\nUNION ALL\n")))
  )

  // ---------------------------------------------------------------
  // x_ts_acf
  // ---------------------------------------------------------------

  /** Autocorrelation function of the daily event-count series at lags
    * 1..14 — the seasonality detector (a weekly cycle shows as a peak
    * at lag 7): r_k = Σ d_t·d_{t+k} / Σ d_t² with deviations carried
    * as the exact scaled integer d_t = n·y_t − Σy (no float mean, the
    * CUSUM discipline). The corpus collapses to one daily count; the
    * lag pairing is a self-join of the calendar-bounded day frame
    * (≤ days × 14 rows); one double division per lag at the emit.
    * (d_t·d_{t+k} is BIGINT-exact up to ~10⁹ events/day at 100 days;
    * past that widen the products to DECIMAL(38,0).) */
  private val x_ts_acf = Q(
    "x_ts_acf",
    (s, d) => {
      val daily = Tables.events(s, d).filter(col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      val tot = daily.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
      val base = daily
        .withColumn("t", row_number().over(Window.orderBy(col("day"))))
        .crossJoin(broadcast(tot))
        .select(col("t"), (col("n") * col("y") - col("sy")).as("dev"))
      val den = base.agg(sum(col("dev") * col("dev")).as("den"))
      val lagged = base
        .withColumn("lag", explode(sequence(lit(1), lit(14))))
        .select(col("lag"), (col("t") + col("lag")).as("t2"), col("dev"))
      val pairs = lagged.join(
        base.select(col("t").as("t2"), col("dev").as("dev2")), "t2")
      pairs.groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("dev") * col("dev2")).as("num"))
        .crossJoin(broadcast(den))
        .select(col("lag").cast("int").as("lag"), col("n_pairs"),
          expr("CAST(ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)" +
            " * 1000000) AS BIGINT)").as("r_micro"))
    },
    Some("""WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(y) AS BIGINT) AS sy FROM daily),
      base AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
          CAST(n * y - sy AS BIGINT) AS dev
        FROM daily CROSS JOIN tot),
      den AS (SELECT CAST(SUM(dev * dev) AS BIGINT) AS den FROM base),
      pairs AS (
        SELECT l.lag, a.dev AS dev, b.dev AS dev2
        FROM base a
        CROSS JOIN (SELECT unnest(range(1, 15)) AS lag) l
        JOIN base b ON b.t = a.t + l.lag)
      SELECT CAST(lag AS INTEGER) AS lag,
        CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(ROUND(CAST(SUM(dev * dev2) AS DOUBLE)
          / CAST((SELECT den FROM den) AS DOUBLE) * 1000000) AS BIGINT)
          AS r_micro
      FROM pairs
      GROUP BY 1"""))

  // ---------------------------------------------------------------
  // x_stat_spearman
  // ---------------------------------------------------------------

  /** Spearman rank correlation between order size (items per order)
    * and order value (the 4096-bin cents grid) — the monotone-
    * association test, computed as Pearson over MIDRANKS without
    * ever ranking rows: both variables live on bounded grids, so the
    * corpus collapses to the (x, y-bin) CONTINGENCY matrix, midranks
    * come from cumulative windows over the two marginal frames, and
    * every row-level sum is a Σ over cells of cnt·rx·ry. Ranks are
    * carried DOUBLED (integral midrank halves; the doubling cancels
    * in ρ exactly); cell products are summed in DECIMAL(38,0) /
    * HUGEINT (n·rank² overflows BIGINT at corpus scale) and the four
    * normal-equation factors combine once in double. */
  private val x_stat_spearman = Q(
    "x_stat_spearman",
    (s, d) => {
      val x = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("x"))
      val rows = Tables.orders(s, d)
        .join(x, col("o_orderkey") === col("l_orderkey"))
        .select(col("x"), binExpr("o_totalprice").as("yb"))
      val cells = rows.groupBy(col("x"), col("yb"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true) // marginals + the cell sum all read it
      val wx = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val mx = cells.groupBy(col("x")).agg(sum(col("cnt")).as("m"))
        .withColumn("rx2",
          coalesce(sum(col("m")).over(wx), lit(0L)) * 2 + col("m") + 1)
      val wy = Window.orderBy(col("yb"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val my = cells.groupBy(col("yb")).agg(sum(col("cnt")).as("m"))
        .withColumn("ry2",
          coalesce(sum(col("m")).over(wy), lit(0L)) * 2 + col("m") + 1)
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val joined = cells
        .join(broadcast(mx.select(col("x"), col("rx2"))), "x")
        .join(broadcast(my.select(col("yb"), col("ry2"))), "yb")
      joined.agg(
        sum(col("cnt")).as("n"),
        sum(dec(col("cnt")) * dec(col("rx2")) * dec(col("ry2"))).as("sxy"),
        sum(dec(col("cnt")) * dec(col("rx2"))).as("sx"),
        sum(dec(col("cnt")) * dec(col("ry2"))).as("sy"),
        sum(dec(col("cnt")) * dec(col("rx2")) * dec(col("rx2"))).as("sxx"),
        sum(dec(col("cnt")) * dec(col("ry2")) * dec(col("ry2"))).as("syy"))
        .select(col("n"), expr("""ROUND(
          |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |  / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          |     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)"""
          .stripMargin).as("rho"))
    },
    Some(s"""WITH x AS (
        SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS x
        FROM lineitem GROUP BY 1),
      rows_ AS (
        SELECT x, ${binSql("o_totalprice")} AS yb
        FROM orders JOIN x ON o_orderkey = l_orderkey),
      cells AS (
        SELECT x, yb, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM rows_ GROUP BY 1, 2),
      mx AS (
        SELECT x, CAST(COALESCE(SUM(m) OVER (ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2
            + m + 1 AS BIGINT) AS rx2
        FROM (SELECT x, CAST(SUM(cnt) AS BIGINT) AS m
          FROM cells GROUP BY 1)),
      my AS (
        SELECT yb, CAST(COALESCE(SUM(m) OVER (ORDER BY yb
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2
            + m + 1 AS BIGINT) AS ry2
        FROM (SELECT yb, CAST(SUM(cnt) AS BIGINT) AS m
          FROM cells GROUP BY 1)),
      sums AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n,
          SUM(CAST(cnt AS HUGEINT) * rx2 * ry2) AS sxy,
          SUM(CAST(cnt AS HUGEINT) * rx2) AS sx,
          SUM(CAST(cnt AS HUGEINT) * ry2) AS sy,
          SUM(CAST(cnt AS HUGEINT) * rx2 * rx2) AS sxx,
          SUM(CAST(cnt AS HUGEINT) * ry2 * ry2) AS syy
        FROM cells JOIN mx USING (x) JOIN my USING (yb))
      SELECT n, ROUND(
        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS rho
      FROM sums"""))

  // ---------------------------------------------------------------
  // x_ml_feature_mi
  // ---------------------------------------------------------------

  /** Mutual information between hour-of-day and event type — the
    * feature-selection score ("is this feature informative about the
    * label?") over a BOUNDED contingency matrix (24 × |types|): one
    * combinable cell count over the corpus, ln terms micro-quantized
    * from exact integer ratios (the PMI discipline), MI and the two
    * marginal entropies finalized in double, plus the normalized
    * MI / min(H_x, H_y). (Σ c·ln_micro is BIGINT-exact to ~10¹¹
    * events; widen to DECIMAL(38,0) past that.) */
  private val x_ml_feature_mi = Q(
    "x_ml_feature_mi",
    (s, d) => {
      val rows = Tables.events(s, d)
        .filter(col("ts").isNotNull && col("event_type").isNotNull)
        .select(hour(col("ts")).as("h"), col("event_type").as("ty"))
      val cells = rows.groupBy(col("h"), col("ty"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // marginals + MI sum all read it
      val mh = cells.groupBy(col("h")).agg(sum(col("c")).as("ch"))
      val mt = cells.groupBy(col("ty")).agg(sum(col("c")).as("ct"))
      val tot = cells.agg(sum(col("c")).as("n"))
      val terms = cells.join(broadcast(mh), "h").join(broadcast(mt), "ty")
        .crossJoin(broadcast(tot))
        .select(col("n"), col("c"), col("ch"), col("ct"),
          expr("""CAST(ROUND(LN(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
            |  / (CAST(ch AS DOUBLE) * CAST(ct AS DOUBLE))) * 1000000)
            |AS BIGINT)""".stripMargin).as("ln_micro"))
      val hx = mh.crossJoin(broadcast(tot))
        .agg(sum(col("ch") * expr(
          """CAST(ROUND(LN(CAST(n AS DOUBLE) / CAST(ch AS DOUBLE))
            | * 1000000) AS BIGINT)""".stripMargin)).as("hx_sum"),
          max(col("n")).as("n1"))
        .select(expr("CAST(ROUND(CAST(hx_sum AS DOUBLE) / n1) AS BIGINT)")
          .as("hx_micro"))
      val hy = mt.crossJoin(broadcast(tot))
        .agg(sum(col("ct") * expr(
          """CAST(ROUND(LN(CAST(n AS DOUBLE) / CAST(ct AS DOUBLE))
            | * 1000000) AS BIGINT)""".stripMargin)).as("hy_sum"),
          max(col("n")).as("n2"))
        .select(expr("CAST(ROUND(CAST(hy_sum AS DOUBLE) / n2) AS BIGINT)")
          .as("hy_micro"))
      terms.agg(max(col("n")).as("n"),
          sum(col("c") * col("ln_micro")).as("mi_sum"))
        .select(col("n"),
          expr("CAST(ROUND(CAST(mi_sum AS DOUBLE) / n) AS BIGINT)")
            .as("mi_micro"))
        .crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
        .withColumn("nmi", expr("""ROUND(CAST(mi_micro AS DOUBLE)
          | / LEAST(CAST(hx_micro AS DOUBLE), CAST(hy_micro AS DOUBLE)),
          | 6)""".stripMargin))
    },
    Some("""WITH rows_ AS (
        SELECT hour(ts) AS h, event_type AS ty
        FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
      cells AS (
        SELECT h, ty, CAST(COUNT(*) AS BIGINT) AS c
        FROM rows_ GROUP BY 1, 2),
      mh AS (SELECT h, CAST(SUM(c) AS BIGINT) AS ch FROM cells GROUP BY 1),
      mt AS (SELECT ty, CAST(SUM(c) AS BIGINT) AS ct FROM cells GROUP BY 1),
      tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
      mi AS (
        SELECT ANY_VALUE(n) AS n,
          CAST(ROUND(CAST(SUM(c * CAST(ROUND(LN(
              CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
              / (CAST(ch AS DOUBLE) * CAST(ct AS DOUBLE))) * 1000000)
            AS BIGINT)) AS DOUBLE) / ANY_VALUE(n)) AS BIGINT) AS mi_micro
        FROM cells JOIN mh USING (h) JOIN mt USING (ty) CROSS JOIN tot),
      hx AS (
        SELECT CAST(ROUND(CAST(SUM(ch * CAST(ROUND(LN(
              CAST(n AS DOUBLE) / CAST(ch AS DOUBLE)) * 1000000)
            AS BIGINT)) AS DOUBLE) / ANY_VALUE(n)) AS BIGINT) AS hx_micro
        FROM mh CROSS JOIN tot),
      hy AS (
        SELECT CAST(ROUND(CAST(SUM(ct * CAST(ROUND(LN(
              CAST(n AS DOUBLE) / CAST(ct AS DOUBLE)) * 1000000)
            AS BIGINT)) AS DOUBLE) / ANY_VALUE(n)) AS BIGINT) AS hy_micro
        FROM mt CROSS JOIN tot)
      SELECT n, mi_micro, hx_micro, hy_micro,
        ROUND(CAST(mi_micro AS DOUBLE)
          / LEAST(CAST(hx_micro AS DOUBLE), CAST(hy_micro AS DOUBLE)), 6)
          AS nmi
      FROM mi CROSS JOIN hx CROSS JOIN hy"""))

  // ---------------------------------------------------------------
  // x_dq_pk_uniqueness
  // ---------------------------------------------------------------

  /** Primary-key uniqueness audit over six declared keys — the twin
    * of the FK orphan audit: per relation, row count, distinct-key
    * count, duplicated-key count and the worst multiplicity. The
    * testdata's lineitem (l_orderkey, l_linenumber) is a KNOWN
    * violator (duplicate pairs are planted — the tie-robustness
    * fixture), so the audit must both catch it and stay zero on the
    * clean keys.
    *
    * Scale shape: one combinable per-key count groupBy per relation,
    * folded immediately to a 1-row summary — duplicate ROWS are never
    * materialized. */
  private val x_dq_pk_uniqueness = Q(
    "x_dq_pk_uniqueness",
    (s, d) => {
      def audit(rel: String, df: DataFrame, keys: Seq[String]): DataFrame =
        df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
          .agg(sum(col("__c")).as("n_rows"),
            count(lit(1)).as("n_keys"),
            sum(when(col("__c") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
            max(col("__c")).as("max_multiplicity"))
          .select(lit(rel).as("relation"), col("n_rows"), col("n_keys"),
            col("n_dup_keys"), col("max_multiplicity"))
      audit("customer.c_custkey", Tables.customer(s, d), Seq("c_custkey"))
        .unionAll(audit("supplier.s_suppkey", Tables.supplier(s, d),
          Seq("s_suppkey")))
        .unionAll(audit("part.p_partkey", Tables.part(s, d),
          Seq("p_partkey")))
        .unionAll(audit("orders.o_orderkey", Tables.orders(s, d),
          Seq("o_orderkey")))
        .unionAll(audit("lineitem.(orderkey,linenumber)",
          Tables.lineitem(s, d), Seq("l_orderkey", "l_linenumber")))
        .unionAll(audit("events.event_id", Tables.events(s, d),
          Seq("event_id")))
    },
    Some(Seq(
      ("customer.c_custkey", "customer", "c_custkey"),
      ("supplier.s_suppkey", "supplier", "s_suppkey"),
      ("part.p_partkey", "part", "p_partkey"),
      ("orders.o_orderkey", "orders", "o_orderkey"),
      ("lineitem.(orderkey,linenumber)", "lineitem",
        "l_orderkey, l_linenumber"),
      ("events.event_id", "events", "event_id"))
      .map { case (rel, t, k) =>
        s"""SELECT '$rel' AS relation,
          CAST(SUM(c) AS BIGINT) AS n_rows,
          CAST(COUNT(*) AS BIGINT) AS n_keys,
          CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_dup_keys,
          CAST(MAX(c) AS BIGINT) AS max_multiplicity
        FROM (SELECT COUNT(*) AS c FROM $t GROUP BY $k)"""
      }.mkString("\nUNION ALL\n")))

  // ---------------------------------------------------------------
  // x_stat_theil_sen
  // ---------------------------------------------------------------

  /** Theil–Sen robust trend estimate over the daily event-count
    * series: slope = MEDIAN of all pairwise slopes (y_j−y_i)/(d_j−d_i),
    * intercept = median of (y_i − slope·d_i) — the 29.3%-breakdown
    * alternative to the OLS trend line (Sen 1968), the estimator a
    * monitoring pipeline wants when a deploy-day outlier would drag
    * least squares.
    *
    * Exactness: slopes are carried as truncating integer micro units
    * ((Δy·10⁶) DIV Δd — both engines truncate toward zero), medians
    * are the LOWER median picked by rank — no floats anywhere. Scale
    * shape: ONE combinable daily count touches the corpus; the
    * pairwise frame is calendar² (≤366² ≈ 134k rows — bounded at any
    * corpus size), and the median windows run only over it. */
  private val x_stat_theil_sen = Q(
    "x_stat_theil_sen",
    (s, d) => {
      val daily = Tables.events(s, d).filter(col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
        .select(datediff(col("day"), to_date(lit("1970-01-01")))
          .cast("long").as("dn"), col("y"))
        .localCheckpoint(true) // pair join (×2) + the intercept pass
      val pairs = daily.select(col("dn").as("di"), col("y").as("yi"))
        .join(daily.select(col("dn").as("dj"), col("y").as("yj")),
          col("dj") > col("di"))
        .select(col("di"), col("dj"),
          expr("(yj - yi) * 1000000 DIV (dj - di)").as("sm"))
      val wS = Window.orderBy(col("sm"), col("di"), col("dj"))
      val slope = pairs
        .withColumn("rn", row_number().over(wS))
        .crossJoin(broadcast(pairs.agg(count(lit(1)).as("n_pairs"))))
        .filter(col("rn") === expr("(n_pairs + 1) DIV 2"))
        .select(col("n_pairs"), col("sm").as("slope_micro"))
      val wI = Window.orderBy(col("im"), col("dn"))
      daily.crossJoin(broadcast(slope))
        .select(col("n_pairs"), col("slope_micro"), col("dn"),
          (col("y") * 1000000L - col("slope_micro") * col("dn")).as("im"))
        .withColumn("rn", row_number().over(wI))
        .crossJoin(broadcast(daily.agg(count(lit(1)).as("n_days"))))
        .filter(col("rn") === expr("(n_days + 1) DIV 2"))
        .select(col("n_days"), col("n_pairs"), col("slope_micro"),
          col("im").as("intercept_micro"))
    },
    Some("""WITH daily AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
          CAST(COUNT(*) AS BIGINT) AS y
        FROM events WHERE ts IS NOT NULL
        GROUP BY 1),
      pairs AS (
        SELECT a.di, a.dj, (a.yj - a.yi) * 1000000 // (a.dj - a.di) AS sm
        FROM (SELECT i.dn AS di, i.y AS yi, j.dn AS dj, j.y AS yj
              FROM daily i JOIN daily j ON j.dn > i.dn) a),
      slope AS (
        SELECT n_pairs, sm AS slope_micro FROM (
          SELECT sm, di, dj,
            ROW_NUMBER() OVER (ORDER BY sm, di, dj) AS rn,
            CAST(COUNT(*) OVER () AS BIGINT) AS n_pairs
          FROM pairs)
        WHERE rn = (n_pairs + 1) // 2),
      inter AS (
        SELECT n_days, n_pairs, slope_micro, im AS intercept_micro FROM (
          SELECT s.n_pairs, s.slope_micro, d.dn,
            d.y * 1000000 - s.slope_micro * d.dn AS im,
            ROW_NUMBER() OVER (ORDER BY d.y * 1000000 - s.slope_micro * d.dn,
              d.dn) AS rn,
            CAST(COUNT(*) OVER () AS BIGINT) AS n_days
          FROM daily d CROSS JOIN slope s)
        WHERE rn = (n_days + 1) // 2)
      SELECT n_days, n_pairs, slope_micro, intercept_micro FROM inter"""))

  // ---------------------------------------------------------------
  // x_stat_gini
  // ---------------------------------------------------------------

  /** Revenue-concentration Gini over customers — the inequality
    * summary (and Lorenz endpoint shares) a marketplace warehouse
    * tracks: G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over the
    * revenue-ascending order, computed EXACTLY — revenues as integer
    * cents, ranks from the RANGE-PARTITIONED global row number (no
    * single-task sort at any corpus size — the rownum machinery), the
    * Σ i·x product widened to DECIMAL(38,0) (rank·cents passes BIGINT
    * around 10⁹ customers), and the final ratio one truncating micro
    * division mirrored on both engines. Ties rank deterministically
    * by customer key, which leaves G unchanged (equal x swap freely).
    *
    * Scale shape: one combinable per-customer sum, one range shuffle
    * for the rownum, one combinable 1-row reduce. */
  private val x_stat_gini = Q(
    "x_stat_gini",
    (s, d) => {
      val rev = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(expr("CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100, 0)"
          + " AS BIGINT)) AS BIGINT)").as("cents"))
      val ranked = graft.ops.Scale.globalRowNumberBy(rev,
        Seq(col("cents"), col("o_custkey")))
      ranked.agg(
          count(lit(1)).cast("long").as("n_customers"),
          sum(col("cents")).cast("long").as("total_cents"),
          sum(expr("CAST(global_rn AS DECIMAL(38,0)) * cents")).as("ix"))
        .select(col("n_customers"), col("total_cents"),
          expr("CAST((2 * ix - CAST(n_customers + 1 AS DECIMAL(38,0))" +
            " * total_cents) * 1000000" +
            " DIV (CAST(n_customers AS DECIMAL(38,0)) * total_cents)" +
            " AS BIGINT)").as("gini_micro"))
    },
    Some("""WITH rev AS (
      SELECT o_custkey,
        CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100, 0)
          AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1),
    ranked AS (
      SELECT cents,
        CAST(ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS BIGINT)
          AS global_rn
      FROM rev),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
        CAST(SUM(cents) AS BIGINT) AS total_cents,
        SUM(CAST(global_rn AS DECIMAL(38,0)) * cents) AS ix
      FROM ranked)
    SELECT n_customers, total_cents,
      CAST((2 * ix - CAST(n_customers + 1 AS DECIMAL(38,0)) * total_cents)
        * 1000000
        // (CAST(n_customers AS DECIMAL(38,0)) * total_cents) AS BIGINT)
        AS gini_micro
    FROM agg"""))

  // ---------------------------------------------------------------
  // x_stat_qq
  // ---------------------------------------------------------------

  /** Q–Q comparison of the two market segments: decile quantiles of
    * both distributions read off the SHARED bin grid — the visual-
    * diagnostic companion to the KS statistic (KS gives the max CDF
    * gap; the Q–Q table says WHERE the distributions diverge). Decile
    * q's bin is the first whose cumulative count reaches ⌈q·n/10⌉,
    * an exact integer condition (cum·10 ≥ q·n — no division), so the
    * picks are bit-deterministic. Scale shape: the one combinable
    * per-bin count over the corpus, then a 9×4096 bounded cross join
    * and argmin per (decile, side). */
  private val x_stat_qq = Q(
    "x_stat_qq",
    (s, d) => {
      val perBin = segPoints(s, d)
        .groupBy(col("b"))
        .agg(count(when(col("is_a"), 1)).as("na"),
          count(when(!col("is_a"), 1)).as("nb"))
      val w = Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = perBin
        .withColumn("ca", sum(col("na")).over(w))
        .withColumn("cb", sum(col("nb")).over(w))
      val tot = perBin.agg(sum(col("na")).cast("long").as("nta"),
        sum(col("nb")).cast("long").as("ntb"))
      val deciles = s.range(1, 10).select(col("id").as("decile"))
      cum.crossJoin(broadcast(tot)).crossJoin(broadcast(deciles))
        .groupBy(col("decile"))
        .agg(
          min(when(col("ca") * 10 >= col("decile") * col("nta"), col("b")))
            .as("bin_a"),
          min(when(col("cb") * 10 >= col("decile") * col("ntb"), col("b")))
            .as("bin_b"))
        .select(col("decile"), col("bin_a"), col("bin_b"),
          (col("bin_b") - col("bin_a")).as("shift_bins"))
    },
    Some(s"""WITH pts AS ($segPointsSql),
      per_bin AS (
        SELECT b,
          CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
          CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS nb
        FROM pts GROUP BY 1),
      cum AS (
        SELECT b,
          CAST(SUM(na) OVER (ORDER BY b) AS BIGINT) AS ca,
          CAST(SUM(nb) OVER (ORDER BY b) AS BIGINT) AS cb
        FROM per_bin),
      tot AS (
        SELECT CAST(SUM(na) AS BIGINT) AS nta,
          CAST(SUM(nb) AS BIGINT) AS ntb
        FROM per_bin),
      deciles AS (SELECT CAST(UNNEST(range(1, 10)) AS BIGINT) AS decile)
      SELECT decile,
        CAST(MIN(CASE WHEN ca * 10 >= decile * nta THEN b END) AS BIGINT)
          AS bin_a,
        CAST(MIN(CASE WHEN cb * 10 >= decile * ntb THEN b END) AS BIGINT)
          AS bin_b,
        CAST(MIN(CASE WHEN cb * 10 >= decile * ntb THEN b END)
          - MIN(CASE WHEN ca * 10 >= decile * nta THEN b END) AS BIGINT)
          AS shift_bins
      FROM cum CROSS JOIN tot CROSS JOIN deciles
      GROUP BY 1"""))

  // ---------------------------------------------------------------
  // x_stat_bh_fdr
  // ---------------------------------------------------------------

  /** Benjamini–Hochberg FDR control over a family of per-event-type
    * goodness-of-fit tests — the multiple-testing correction any
    * monitoring stack needs once it runs one drift test PER SEGMENT
    * (the x_dq_drift / x_stat_chi2 queries each test one hypothesis;
    * at |types| hypotheses the naive α inflates the false-alarm rate).
    *
    * Per type: χ² of the 3-bucket time-of-day distribution (hour DIV 8)
    * against the pooled distribution, df = 2 — chosen because at df = 2
    * the χ² survival function is EXACTLY p = exp(−χ²/2), so the p-value
    * needs no incomplete-gamma machinery. Determinism discipline:
    * the χ² itself is exact-integer work (the (O·N − n_t·N_b)² numerator
    * in DECIMAL(38,0), denominators likewise) finalized once per bucket
    * in double through an IDENTICAL fixed-association expression tree
    * on both engines (+,−,×,÷ are IEEE-correctly-rounded per op, so the
    * doubles are bit-identical); then ONE transcendental micro-quantized
    * (p_micro = round(exp(−χ²/2)·10⁶) — the GMM-E-step/PMI discipline),
    * and the BH step-up decision is pure integer arithmetic:
    * reject ranks 1..k where k = max{i : p_micro(i)·m ≤ i·100000}
    * (α = 0.10 ⇒ i·α·10⁶ = i·100000).
    *
    * Scale shape: ONE combinable (type, bucket) count over the corpus;
    * the grid completion, pivot, χ², ranking, and the BH window max all
    * run on the ≤|types|·3 frame — bounded at any corpus size. */
  private val x_stat_bh_fdr = Q(
    "x_stat_bh_fdr",
    (s, d) => {
      val counts = Tables.events(s, d)
        .filter(col("ts").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type"), expr("hour(ts) DIV 8").as("bucket"))
        .agg(count(lit(1)).cast("long").as("o"))
      // complete the |types|x3 grid so zero-count buckets still
      // contribute their expected-count term
      val grid = counts.select(col("event_type")).distinct()
        .crossJoin(broadcast(
          s.range(3).select(col("id").cast("long").as("bucket"))))
      val full = grid.join(counts, Seq("event_type", "bucket"), "left")
        .na.fill(0L, Seq("o"))
      val bucketTot = full.groupBy(col("bucket"))
        .agg(sum(col("o")).as("nb"))
      val pooled = bucketTot.agg(
        max(when(col("bucket") === 0, col("nb"))).as("nb0"),
        max(when(col("bucket") === 1, col("nb"))).as("nb1"),
        max(when(col("bucket") === 2, col("nb"))).as("nb2"),
        sum(col("nb")).as("n"))
      val perType = full.groupBy(col("event_type")).agg(
        max(when(col("bucket") === 0, col("o"))).as("o0"),
        max(when(col("bucket") === 1, col("o"))).as("o1"),
        max(when(col("bucket") === 2, col("o"))).as("o2"),
        sum(col("o")).as("nt"))
      // widen BOTH products to DECIMAL(38,0) BEFORE multiplying (o·n
      // wraps int64 around ~3e9 events otherwise — silent in Spark, a
      // hard error in DuckDB), then square in DOUBLE (exact-decimal
      // square would itself outgrow 38 digits near the same scale;
      // IEEE double ops are bit-identical across engines)
      def term(o: String, nb: String): String =
        s"""CASE WHEN $nb > 0 THEN
           |  CAST(CAST($o AS DECIMAL(38,0)) * n
           |    - CAST(nt AS DECIMAL(38,0)) * $nb AS DOUBLE)
           |  * CAST(CAST($o AS DECIMAL(38,0)) * n
           |    - CAST(nt AS DECIMAL(38,0)) * $nb AS DOUBLE)
           | / CAST(CAST(n AS DECIMAL(38,0)) * nt * $nb AS DOUBLE)
           | ELSE CAST(0 AS DOUBLE) END""".stripMargin
      val chi2 = perType.crossJoin(broadcast(pooled))
        .withColumn("chi2", expr(
          s"(${term("o0", "nb0")}) + (${term("o1", "nb1")})" +
            s" + (${term("o2", "nb2")})"))
        .select(col("event_type"),
          expr("CAST(ROUND(chi2 * 1000000) AS BIGINT)").as("chi2_micro"),
          expr("CAST(ROUND(EXP(-chi2 / 2) * 1000000) AS BIGINT)")
            .as("p_micro"))
      val wAll = Window.orderBy(col("p_micro"), col("event_type"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val ranked = chi2
        .withColumn("rank", row_number().over(
          Window.orderBy(col("p_micro"), col("event_type"))))
        .withColumn("m", count(lit(1)).over(wAll))
        .withColumn("k", max(when(
          col("p_micro") * col("m") <= col("rank") * lit(100000L),
          col("rank"))).over(wAll))
      ranked.select(col("event_type"), col("chi2_micro"), col("p_micro"),
        col("rank").cast("long").as("rank"),
        (col("k").isNotNull && col("rank") <= col("k")).as("rejected"))
    },
    Some("""WITH counts AS (
        SELECT event_type, hour(ts) // 8 AS bucket,
          CAST(COUNT(*) AS BIGINT) AS o
        FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2),
      grid AS (
        SELECT t.event_type, b.bucket
        FROM (SELECT DISTINCT event_type FROM counts) t
        CROSS JOIN (SELECT CAST(UNNEST(range(3)) AS BIGINT) AS bucket) b),
      full_g AS (
        SELECT g.event_type, g.bucket, COALESCE(c.o, 0) AS o
        FROM grid g LEFT JOIN counts c
          ON g.event_type = c.event_type AND g.bucket = c.bucket),
      pooled AS (
        SELECT
          CAST(SUM(CASE WHEN bucket = 0 THEN o END) AS BIGINT) AS nb0,
          CAST(SUM(CASE WHEN bucket = 1 THEN o END) AS BIGINT) AS nb1,
          CAST(SUM(CASE WHEN bucket = 2 THEN o END) AS BIGINT) AS nb2,
          CAST(SUM(o) AS BIGINT) AS n
        FROM full_g),
      per_type AS (
        SELECT event_type,
          CAST(MAX(CASE WHEN bucket = 0 THEN o END) AS BIGINT) AS o0,
          CAST(MAX(CASE WHEN bucket = 1 THEN o END) AS BIGINT) AS o1,
          CAST(MAX(CASE WHEN bucket = 2 THEN o END) AS BIGINT) AS o2,
          CAST(SUM(o) AS BIGINT) AS nt
        FROM full_g GROUP BY 1),
      chi AS (
        SELECT event_type,
          (CASE WHEN nb0 > 0 THEN
              CAST(CAST(o0 AS DECIMAL(38,0)) * n
                - CAST(nt AS DECIMAL(38,0)) * nb0 AS DOUBLE)
              * CAST(CAST(o0 AS DECIMAL(38,0)) * n
                - CAST(nt AS DECIMAL(38,0)) * nb0 AS DOUBLE)
            / CAST(CAST(n AS DECIMAL(38,0)) * nt * nb0 AS DOUBLE)
            ELSE CAST(0 AS DOUBLE) END)
          + (CASE WHEN nb1 > 0 THEN
              CAST(CAST(o1 AS DECIMAL(38,0)) * n
                - CAST(nt AS DECIMAL(38,0)) * nb1 AS DOUBLE)
              * CAST(CAST(o1 AS DECIMAL(38,0)) * n
                - CAST(nt AS DECIMAL(38,0)) * nb1 AS DOUBLE)
            / CAST(CAST(n AS DECIMAL(38,0)) * nt * nb1 AS DOUBLE)
            ELSE CAST(0 AS DOUBLE) END)
          + (CASE WHEN nb2 > 0 THEN
              CAST(CAST(o2 AS DECIMAL(38,0)) * n
                - CAST(nt AS DECIMAL(38,0)) * nb2 AS DOUBLE)
              * CAST(CAST(o2 AS DECIMAL(38,0)) * n
                - CAST(nt AS DECIMAL(38,0)) * nb2 AS DOUBLE)
            / CAST(CAST(n AS DECIMAL(38,0)) * nt * nb2 AS DOUBLE)
            ELSE CAST(0 AS DOUBLE) END) AS chi2
        FROM per_type CROSS JOIN pooled),
      q AS (
        SELECT event_type,
          CAST(ROUND(chi2 * 1000000) AS BIGINT) AS chi2_micro,
          CAST(ROUND(EXP(-chi2 / 2) * 1000000) AS BIGINT) AS p_micro
        FROM chi),
      ranked AS (
        SELECT *,
          CAST(ROW_NUMBER() OVER (ORDER BY p_micro, event_type)
            AS BIGINT) AS rank,
          CAST(COUNT(*) OVER () AS BIGINT) AS m
        FROM q),
      kk AS (
        SELECT *, MAX(CASE WHEN p_micro * m <= rank * 100000
            THEN rank END) OVER () AS k
        FROM ranked)
      SELECT event_type, chi2_micro, p_micro, rank,
        (k IS NOT NULL AND rank <= k) AS rejected
      FROM kk"""))

  val all: Seq[Q] = Seq(
    x_dq_pk_uniqueness,
    x_stat_ks_test,
    x_stat_mannwhitney,
    x_stat_anova,
    x_stat_spearman,
    x_stat_cusum_changepoint,
    x_stat_theil_sen,
    x_stat_bh_fdr,
    x_stat_qq,
    x_stat_gini,
    x_ts_acf,
    x_ml_feature_mi,
    x_dq_ref_integrity)
}
