package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
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
        ROUND((CAST(u1_x2 AS DOUBLE) - mu_x2) / 2.0 / sqrt(var_u), 6) AS z,
        abs((CAST(u1_x2 AS DOUBLE) - mu_x2) / 2.0 / sqrt(var_u))
          > CAST('1.96' AS DOUBLE) AS significant
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

  val all: Seq[Q] = Seq(
    x_stat_ks_test,
    x_stat_mannwhitney,
    x_stat_cusum_changepoint,
    x_dq_ref_integrity)
}
