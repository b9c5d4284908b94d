package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{Exact, Tables}
import graft.ops.Sampling

/** Relational-completeness extensions: SQL surface the reference never
  * reaches for (SURVEY §2.3 "no semi/anti joins", §2.4 "no grouping
  * sets", §2.5 frame list) but that any user migrating real warehouse
  * workloads onto this engine expects day one — semi/anti joins, ROLLUP
  * subtotals, pivot, and the remaining analytic window functions. Each
  * is oracle-checked against DuckDB like the core inventory.
  */
object RelationalQueries {

  /** Semi/anti joins (EXISTS / NOT EXISTS): per-segment balance rollup of
    * customers WITH an open order (left_semi — no row duplication however
    * many orders match) unioned with customers with NO orders at all
    * (left_anti). Both plan as one shuffle each; the probe side is never
    * widened by the join. */
  private val x_rel_semi_anti = Q(
    "x_rel_semi_anti",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val orders = Tables.orders(s, d)
      def perSegment(df: org.apache.spark.sql.DataFrame, cohort: String) =
        df.groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n_customers"),
            Exact.sumMoney(col("c_acctbal")).as("total_balance"))
          .withColumn("cohort", lit(cohort))
      val hasOpen = cust.join(
        orders.filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      val noOrders = cust.join(orders,
        col("c_custkey") === col("o_custkey"), "left_anti")
      perSegment(hasOpen, "HAS_OPEN").unionByName(perSegment(noOrders, "NO_ORDERS"))
    },
    Some(s"""SELECT c_mktsegment AS segment, COUNT(*) AS n_customers,
      ${Exact.sumMoneySql("c_acctbal")} AS total_balance, 'HAS_OPEN' AS cohort
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    GROUP BY 1
    UNION ALL
    SELECT c_mktsegment AS segment, COUNT(*) AS n_customers,
      ${Exact.sumMoneySql("c_acctbal")} AS total_balance, 'NO_ORDERS' AS cohort
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1"""))

  /** ROLLUP subtotals with grouping_id: order counts + exact revenue at
    * (priority, status), per-priority, and grand-total grains in one
    * pass (Spark expands grouping sets before the hash aggregate — still
    * a single shuffle). gid bit order (first key = MSB) matches DuckDB's
    * GROUPING(). */
  private val x_rel_rollup = Q(
    "x_rel_rollup",
    (s, d) => Tables.orders(s, d)
      .rollup(col("o_orderpriority").as("priority"), col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_orders"),
        Exact.sumMoney(col("o_totalprice")).as("revenue"),
        grouping_id().cast("int").as("gid")),
    Some(s"""SELECT o_orderpriority AS priority, o_orderstatus AS status,
      COUNT(*) AS n_orders,
      ${Exact.sumMoneySql("o_totalprice")} AS revenue,
      CAST(GROUPING(o_orderpriority, o_orderstatus) AS INTEGER) AS gid
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)"""))

  /** CUBE: all four grains — (priority, status), per-priority,
    * per-status, grand total — in one pass (Expand before the hash
    * aggregate, still a single shuffle; 4× expand ratio is the price of
    * one-pass subtotals and beats 4 scans at any scale). gid bit order
    * matches DuckDB's GROUPING(). */
  private val x_rel_cube = Q(
    "x_rel_cube",
    (s, d) => Tables.orders(s, d)
      .cube(col("o_orderpriority").as("priority"), col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_orders"),
        Exact.sumMoney(col("o_totalprice")).as("revenue"),
        grouping_id().cast("int").as("gid")),
    Some(s"""SELECT o_orderpriority AS priority, o_orderstatus AS status,
      COUNT(*) AS n_orders,
      ${Exact.sumMoneySql("o_totalprice")} AS revenue,
      CAST(GROUPING(o_orderpriority, o_orderstatus) AS INTEGER) AS gid
    FROM orders
    GROUP BY CUBE(o_orderpriority, o_orderstatus)"""))

  /** CORRELATED scalar subquery ("orders worth more than 2× their own
    * customer's average"), run through spark.sql so Catalyst's
    * decorrelation (RewriteCorrelatedScalarSubquery → aggregate + join)
    * is the operator under test — the one subquery shape the reference's
    * A9 scalar subqueries never exercise. The SQL text is dialect-shared:
    * the DuckDB oracle runs the IDENTICAL statement, and the exact-
    * decimal average (Exact.avgMoney discipline) makes the 2× boundary
    * bit-stable in both engines. */
  private val x_rel_correlated_scalar = Q(
    "x_rel_correlated_scalar",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(correlatedScalarSql)
    },
    Some(correlatedScalarSql))

  private lazy val correlatedScalarSql: String =
    s"""SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders o
    WHERE o_totalprice > 2 * (
      SELECT ${Exact.avgMoneySql("o2.o_totalprice")}
      FROM orders o2 WHERE o2.o_custkey = o.o_custkey)"""

  /** Recursive CTE (Spark 4's WITH RECURSIVE) — calendar densification:
    * a month spine generated recursively, left-joined to per-month order
    * counts so EMPTY months appear as explicit zero rows (the gap-free
    * series every reporting layer wants; a recursive spine needs no
    * sequence table). Dialect-shared SQL: DuckDB runs the IDENTICAL
    * statement; every date hop is CAST back to DATE so neither engine
    * drifts into timestamp typing. */
  private val x_rel_recursive = Q(
    "x_rel_recursive_spine",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(recursiveSpineSql)
    },
    Some(recursiveSpineSql))

  private lazy val recursiveSpineSql: String =
    """WITH RECURSIVE months AS (
      SELECT DATE '1992-01-01' AS m
      UNION ALL
      SELECT CAST(m + INTERVAL '1' MONTH AS DATE) AS m
      FROM months WHERE m < DATE '1998-12-01')
    SELECT m, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
    FROM months
    LEFT JOIN orders ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
    GROUP BY m"""

  /** Explicit GROUPING SETS — the third grouping-sets surface beyond
    * ROLLUP/CUBE: an arbitrary, non-hierarchical grain list ((nation,
    * segment), (nation), (segment)) — note NO grand total, which neither
    * ROLLUP nor CUBE can express — in ONE Expand pass. Dialect-shared
    * SQL; per-column GROUPING() flags (cast to INT on both engines)
    * disambiguate the subtotal NULLs. */
  private val x_rel_grouping_sets = Q(
    "x_rel_grouping_sets",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      s.sql(groupingSetsSql)
    },
    Some(groupingSetsSql))

  private lazy val groupingSetsSql: String =
    s"""SELECT n_name AS nation, c_mktsegment AS segment,
      CAST(GROUPING(n_name) AS INTEGER) AS g_nation,
      CAST(GROUPING(c_mktsegment) AS INTEGER) AS g_segment,
      COUNT(*) AS n_customers,
      ${Exact.sumMoneySql("c_acctbal")} AS total_balance
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (c_mktsegment))"""

  /** Array higher-order functions over the embeddings table — the
    * lambda surface (transform / filter / zip_with / aggregate) LLM
    * feature pipelines reach for before dropping to custom kernels.
    * Float summation parity is by CONSTRUCTION: every element is cast
    * to double BEFORE arithmetic and every reduction is a LEFT FOLD
    * with a double init, so both engines execute the identical IEEE
    * sequence (same discipline as the rolling-hash winnow oracle). */
  private val x_rel_arrays = Q(
    "x_rel_arrays",
    (s, d) => Tables.embeddings(s, d)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + abs(x.cast("double"))).as("l1"),
        aggregate(
          zip_with(col("embedding"), col("embedding"),
            (a, b) => a.cast("double") * b.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("l2sq"),
        size(filter(col("embedding"), x => x > 0.0f)).as("n_pos"),
        aggregate(transform(slice(col("embedding"), 1, 3),
            x => x.cast("double") * 2.0),
          lit(0.0), (acc, x) => acc + x).as("head3_doubled_sum")),
    Some("""SELECT vec_id,
      CAST(len(embedding) AS INTEGER) AS dim,
      list_reduce(list_prepend(0.0, list_transform(embedding,
        x -> abs(CAST(x AS DOUBLE)))), (a, x) -> a + x) AS l1,
      list_reduce(list_prepend(0.0, list_transform(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, x) -> a + x) AS l2sq,
      CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
      list_reduce(list_prepend(0.0, list_transform(embedding[1:3],
        x -> CAST(x AS DOUBLE) * 2.0)), (a, x) -> a + x) AS head3_doubled_sum
    FROM embeddings"""))

  /** Correlated LATERAL subquery — top-2 orders PER customer pulled by a
    * `, LATERAL (... ORDER BY ... LIMIT 2)` derived table, the join-form
    * correlation (each right row computed against the current left row)
    * that scalar/IN subqueries can't express. Catalyst decorrelates it
    * (DecorrelateInnerQuery) into a ranked join rather than per-row
    * re-execution — per-row would be O(customers × orders) at scale.
    * Dialect-shared SQL: DuckDB runs the IDENTICAL statement. LIMIT
    * under correlation needs a TOTAL order — (o_totalprice, o_orderkey
    * DESC) — or the picked rows are engine-dependent; the BUILDING
    * segment restriction keeps output bounded. */
  private val x_rel_lateral = Q(
    "x_rel_lateral_topk",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(lateralTopkSql)
    },
    Some(lateralTopkSql))

  private lazy val lateralTopkSql: String =
    """SELECT c_custkey, t.o_orderkey, CAST(t.o_totalprice AS DOUBLE) AS price
    FROM customer, LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey DESC
      LIMIT 2) t
    WHERE c_mktsegment = 'BUILDING'"""

  /** IN / NOT IN subqueries including the NULL-aware trap: `NOT IN`
    * over a subquery that CONTAINS a NULL matches nothing (three-valued
    * logic — every comparison is at best UNKNOWN), which Spark must
    * plan as a null-aware anti join, not a plain hash anti join. The
    * SQL text is dialect-shared and the DuckDB oracle runs the
    * IDENTICAL statement, so the cohort counts — including the
    * deterministically-zero NULL-poisoned cohort — pin both engines to
    * the same semantics. The subquery is an aggregated key set small
    * enough to broadcast; Spark's single-key NAAJ stays a broadcast
    * hash join, never a cartesian. */
  private val x_rel_in_notin = Q(
    "x_rel_in_notin",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(inNotInSql)
    },
    Some(inNotInSql))

  private lazy val inNotInSql: String =
    """SELECT 'IN_BIG_SPENDER' AS cohort, COUNT(*) AS n_customers
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000)
    UNION ALL
    SELECT 'NOT_IN_BIG_SPENDER' AS cohort, COUNT(*) AS n_customers
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 250000)
    UNION ALL
    SELECT 'NOT_IN_WITH_NULL' AS cohort, COUNT(*) AS n_customers
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 250000
                            UNION ALL SELECT CAST(NULL AS BIGINT))"""

  /** Pivot with an EXPLICIT value list (no values-discovery job — at
    * scale the implicit form is a whole extra distinct+collect over the
    * fact): order-status counts pivoted to columns per priority.
    * Missing cells are coalesced to 0 to match COUNT(CASE ...) SQL. */
  private val x_rel_pivot = Q(
    "x_rel_pivot",
    (s, d) => Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("priority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .select(col("priority"),
        coalesce(col("O"), lit(0L)).as("n_open"),
        coalesce(col("F"), lit(0L)).as("n_finished"),
        coalesce(col("P"), lit(0L)).as("n_partial")),
    Some("""SELECT o_orderpriority AS priority,
      count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
      count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
      count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_partial
    FROM orders GROUP BY 1"""))

  /** The analytic window functions beyond the reference's W1–W7 set:
    * LEAD, NTILE, PERCENT_RANK, CUME_DIST, FIRST_VALUE over the monthly
    * revenue series per priority. The window input is the aggregated
    * series (≤ |priority|×|months| rows), so the window shuffle never
    * sees fact-table volume. rank fractions are rounded to 6dp on both
    * engines. */
  private val x_rel_analytic_suite = Q(
    "x_rel_analytic_suite",
    (s, d) => {
      val monthly = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("priority"),
          year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_month"))
        .agg(Exact.sumMoney(col("o_totalprice")).as("rev"))
      val w = Window.partitionBy(col("priority"))
        .orderBy(col("order_year"), col("order_month"))
      monthly.select(
        col("priority"), col("order_year"), col("order_month"), col("rev"),
        lead(col("rev"), 1).over(w).as("next_rev"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cum_dist"),
        first(col("rev")).over(w).as("first_rev"))
    },
    Some(s"""WITH monthly AS (
      SELECT o_orderpriority AS priority,
        CAST(year(o_orderdate) AS INTEGER) AS order_year,
        CAST(month(o_orderdate) AS INTEGER) AS order_month,
        ${Exact.sumMoneySql("o_totalprice")} AS rev
      FROM orders GROUP BY 1, 2, 3)
    SELECT priority, order_year, order_month, rev,
      LEAD(rev, 1) OVER w AS next_rev,
      CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
      ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
      ROUND(CUME_DIST() OVER w, 6) AS cum_dist,
      FIRST_VALUE(rev) OVER w AS first_rev
    FROM monthly
    WINDOW w AS (PARTITION BY priority ORDER BY order_year, order_month)"""))

  /** Explicit window frames — the one window dimension the reference
    * never sets (SURVEY §2.5 "frames are always the defaults"): a
    * 3-row trailing average (ROWS BETWEEN), a running total, and a
    * RANGE frame over a numeric month index counting adjacent months.
    * Frame sums run in exact decimal and cast to double at the edge so
    * Spark's incremental sliding-frame evaluation cannot drift from the
    * oracle's direct per-frame sums (same discipline as
    * [[graft.core.Exact]]). The window input is the aggregated monthly
    * series, so the window shuffle never sees fact-table volume. */
  private val x_rel_frames = Q(
    "x_rel_frames",
    (s, d) => {
      val monthly = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("priority"),
          year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_month"))
        .agg(Exact.sumMoney(col("o_totalprice")).as("rev"))
        .withColumn("month_idx", col("order_year") * 12 + col("order_month"))
      val wOrd = Window.partitionBy(col("priority"))
        .orderBy(col("order_year"), col("order_month"))
      val w3 = wOrd.rowsBetween(-2, Window.currentRow)
      val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wRange = Window.partitionBy(col("priority"))
        .orderBy(col("month_idx")).rangeBetween(-1, 1)
      val revExact = col("rev").cast(DecimalType(18, 2))
      monthly.select(
        col("priority"), col("order_year"), col("order_month"), col("rev"),
        (sum(revExact).over(w3).cast("double") / count(lit(1)).over(w3))
          .as("avg_3m"),
        sum(revExact).over(wCum).cast("double").as("cum_rev"),
        count(lit(1)).over(wRange).as("n_adjacent"))
    },
    Some(s"""WITH monthly AS (
      SELECT o_orderpriority AS priority,
        CAST(year(o_orderdate) AS INTEGER) AS order_year,
        CAST(month(o_orderdate) AS INTEGER) AS order_month,
        ${Exact.sumMoneySql("o_totalprice")} AS rev
      FROM orders GROUP BY 1, 2, 3)
    SELECT priority, order_year, order_month, rev,
      CAST(SUM(CAST(rev AS DECIMAL(18,2))) OVER w3 AS DOUBLE)
        / COUNT(*) OVER w3 AS avg_3m,
      CAST(SUM(CAST(rev AS DECIMAL(18,2))) OVER wc AS DOUBLE) AS cum_rev,
      COUNT(*) OVER wr AS n_adjacent
    FROM monthly
    WINDOW
      w3 AS (PARTITION BY priority ORDER BY order_year, order_month
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
      wc AS (PARTITION BY priority ORDER BY order_year, order_month
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      wr AS (PARTITION BY priority ORDER BY (order_year * 12 + order_month)
             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)"""))

  /** UNPIVOT (melt) — the inverse of [[x_rel_pivot]]: the wide
    * per-priority revenue-by-status matrix back to long form. Missing
    * cells surface as 0-revenue rows (coalesced before the melt), so
    * the long output is dense: |priority| × |status| rows. */
  private val x_rel_unpivot = Q(
    "x_rel_unpivot",
    (s, d) => {
      val wide = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("priority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(Exact.sumMoney(col("o_totalprice")))
        .select(col("priority"),
          coalesce(col("O"), lit(0.0)).as("O"),
          coalesce(col("F"), lit(0.0)).as("F"),
          coalesce(col("P"), lit(0.0)).as("P"))
      wide.unpivot(Array(col("priority")),
        Array(col("O"), col("F"), col("P")), "status", "revenue")
    },
    Some("""WITH agg AS (
      SELECT o_orderpriority AS priority, o_orderstatus AS status,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1, 2)
    SELECT p.priority, s.status, COALESCE(a.revenue, 0.0) AS revenue
    FROM (SELECT DISTINCT o_orderpriority AS priority FROM orders) p
    CROSS JOIN (SELECT unnest(['O', 'F', 'P']) AS status) s
    LEFT JOIN agg a ON a.priority = p.priority AND a.status = s.status"""))

  /** Ordered string aggregation (LISTAGG / STRING_AGG): per-nation
    * distinct market segments as a sorted CSV. Expressed as
    * collect_set → array_sort → concat_ws, which keeps the result
    * deterministic under Spark's unordered partial aggregation; the
    * set is bounded by the segment domain, so per-group state cannot
    * grow with fact volume. */
  private val x_rel_stringagg = Q(
    "x_rel_stringagg",
    (s, d) => Tables.customer(s, d)
      .groupBy(col("c_nationkey").as("nation_key"))
      .agg(count(lit(1)).as("n_customers"),
        concat_ws(",", array_sort(collect_set(col("c_mktsegment"))))
          .as("segments_csv")),
    Some("""SELECT c_nationkey AS nation_key, COUNT(*) AS n_customers,
      string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments_csv
    FROM customer GROUP BY 1"""))

  /** INTERSECT / EXCEPT (SURVEY §2.7: absent from the reference):
    * customer-retention cohorts — custkeys ordering in both 1996 and
    * 1997, only 1996 (churned), only 1997 (new). Set-op semantics
    * (distinct, null-safe key equality) are identical in Spark and
    * DuckDB; both engines plan these as aggregates/joins, no custom
    * operator needed. */
  private val x_rel_setops = Q(
    "x_rel_setops",
    (s, d) => {
      def yr(y: Int) = Tables.orders(s, d)
        .filter(year(col("o_orderdate")) === y).select(col("o_custkey"))
      yr(1996).intersect(yr(1997)).withColumn("cohort", lit("BOTH"))
        .unionByName(yr(1996).except(yr(1997))
          .withColumn("cohort", lit("ONLY_1996")))
        .unionByName(yr(1997).except(yr(1996))
          .withColumn("cohort", lit("ONLY_1997")))
    },
    Some("""WITH y96 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
         y97 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
    SELECT o_custkey, 'BOTH' AS cohort
    FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
    UNION ALL
    SELECT o_custkey, 'ONLY_1996' AS cohort
    FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
    UNION ALL
    SELECT o_custkey, 'ONLY_1997' AS cohort
    FROM (SELECT * FROM y97 EXCEPT SELECT * FROM y96)"""))

  /** Statistical aggregates (var/stddev/corr/regression). Raw
    * double-summing `corr`/`regr_*` are partition-order-dependent in
    * their low bits, so cross-engine bit equality is impossible on the
    * built-ins directly. Instead: EXACT decimal power sums (n, Σx, Σy,
    * Σx², Σy², Σxy — quantity integral, price 2dp, so every sum is
    * exact; widths sized with 100× headroom under ANSI overflow
    * checking), closed by a PINNED IEEE sequence both engines execute
    * identically — one decimal→double cast per term, then the same
    * division/sqrt tree. The Spark built-ins (var_samp, corr,
    * regr_slope) ride along as tolerance booleans the oracle asserts
    * TRUE, tolerances loose enough to absorb their partition-order
    * jitter while still catching a broken implementation. */
  private val x_rel_stats_suite = Q(
    "x_rel_stats_suite",
    (s, d) => {
      val x = col("l_quantity").cast("decimal(18,0)")
      val y = col("l_extendedprice").cast("decimal(18,2)")
      val sums = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(x).cast("decimal(14,0)").as("sx"),
          sum(y).cast("decimal(18,2)").as("sy"),
          sum(x * x).cast("decimal(20,0)").as("sxx"),
          sum(y * y).cast("decimal(24,4)").as("syy"),
          sum(x * y).cast("decimal(22,2)").as("sxy"),
          var_samp(col("l_quantity")).as("var_b"),
          corr(col("l_quantity"), col("l_extendedprice")).as("corr_b"),
          regr_slope(col("l_extendedprice"), col("l_quantity")).as("slope_b"))
      val nD = col("n").cast("decimal(9,0)")
      val A = (nD * col("sxx") - col("sx") * col("sx")).cast("double")
      val B = (nD * col("syy") - col("sy") * col("sy")).cast("double")
      val C = (nD * col("sxy") - col("sx") * col("sy")).cast("double")
      val nDbl = col("n").cast("double")
      val varQty = when(A === 0.0, lit(0.0))
        .otherwise(A / (nDbl * (nDbl - 1.0)))
      val corrQp = when(A === 0.0 || B === 0.0, lit(null))
        .otherwise(C / (sqrt(A) * sqrt(B)))
      val slopeQp = when(A === 0.0, lit(null)).otherwise(C / A)
      sums
        .withColumn("var_qty", varQty)
        .withColumn("stddev_qty", sqrt(col("var_qty")))
        .withColumn("corr_qp", corrQp)
        .withColumn("slope_qp", slopeQp)
        .withColumn("intercept_qp",
          (col("sy").cast("double") - col("slope_qp") * col("sx").cast("double")) / nDbl)
        .withColumn("r2_qp", col("corr_qp") * col("corr_qp"))
        .select(col("l_returnflag"), col("n").as("n_rows"),
          col("var_qty"), col("stddev_qty"), col("corr_qp"),
          col("slope_qp"), col("intercept_qp"), col("r2_qp"),
          (abs(col("var_b") - col("var_qty")) <= abs(col("var_qty")) * 1e-6).as("var_ok"),
          (abs(col("corr_b") - col("corr_qp")) <= 1e-9).as("corr_ok"),
          (abs(col("slope_b") - col("slope_qp")) <= abs(col("slope_qp")) * 1e-6).as("slope_ok"))
    },
    Some("""WITH a AS (
      SELECT l_returnflag,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))) AS DECIMAL(14,0)) AS sx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sy,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))
               * CAST(l_quantity AS DECIMAL(18,0))) AS DECIMAL(20,0)) AS sxx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(24,4)) AS syy,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(22,2)) AS sxy
      FROM lineitem GROUP BY 1),
    b AS (
      -- operand casts to width>=19 force DuckDB's INT128 physical type:
      -- an 18x18 decimal multiply runs in INT64 and overflows at runtime
      SELECT l_returnflag, n,
        CAST(CAST(n AS DECIMAL(9,0)) * sxx
           - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)) AS DOUBLE) AS va,
        CAST(CAST(n AS DECIMAL(9,0)) * syy
           - CAST(sy AS DECIMAL(19,2)) * CAST(sy AS DECIMAL(19,2)) AS DOUBLE) AS vb,
        CAST(CAST(n AS DECIMAL(9,0)) * sxy
           - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,2)) AS DOUBLE) AS vc,
        CAST(n AS DOUBLE) AS nd,
        CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      FROM a),
    c AS (
      SELECT l_returnflag, n,
        CASE WHEN va = 0.0 THEN 0.0 ELSE va / (nd * (nd - 1.0)) END AS var_qty,
        CASE WHEN va = 0.0 OR vb = 0.0 THEN NULL
             ELSE vc / (sqrt(va) * sqrt(vb)) END AS corr_qp,
        CASE WHEN va = 0.0 THEN NULL ELSE vc / va END AS slope_qp,
        nd, sxd, syd
      FROM b)
    SELECT l_returnflag, n AS n_rows,
      var_qty, sqrt(var_qty) AS stddev_qty, corr_qp, slope_qp,
      (syd - slope_qp * sxd) / nd AS intercept_qp,
      corr_qp * corr_qp AS r2_qp,
      true AS var_ok, true AS corr_ok, true AS slope_ok
    FROM c"""))

  /** Ordered-set aggregates beyond the reference's single median (A6):
    * the full quantile surface — PERCENTILE_CONT and PERCENTILE_DISC at
    * 25/50/75 — plus a DETERMINISTIC mode (highest count, ties broken
    * by smallest value; the built-in `mode()` is tie-arbitrary in both
    * engines, so it can never be oracle-compared). Quartile fractions
    * are exact binary (0.25/0.5/0.75), and l_quantity is integral, so
    * CONT interpolation is exact in both engines; DISC index rules
    * (Spark: smallest value with cume_dist ≥ q; DuckDB: round(q·(n−1)))
    * were verified equal for quarter quantiles at every n. Mode runs as
    * two map-side-combinable aggregates + a WindowGroupLimit top-1 —
    * no per-group sort of raw rows at any scale. */
  private val x_rel_quantiles = Q(
    "x_rel_quantiles",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val quant = li.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n_rows"),
        expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("p25_cont"),
        expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50_cont"),
        expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity)").as("p75_cont"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("p25_disc"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50_disc"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity)").as("p75_disc"))
      val mode = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("l_returnflag"))
            .orderBy(col("c").desc, col("l_quantity").asc)))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"))
      quant.join(mode, Seq("l_returnflag"))
    },
    Some("""WITH q AS (
      SELECT l_returnflag, COUNT(*) AS n_rows,
        quantile_cont(l_quantity, 0.25) AS p25_cont,
        quantile_cont(l_quantity, 0.5) AS p50_cont,
        quantile_cont(l_quantity, 0.75) AS p75_cont,
        quantile_disc(l_quantity, 0.25) AS p25_disc,
        quantile_disc(l_quantity, 0.5) AS p50_disc,
        quantile_disc(l_quantity, 0.75) AS p75_disc
      FROM lineitem GROUP BY 1),
    m AS (
      SELECT l_returnflag, l_quantity AS mode_qty
      FROM (SELECT l_returnflag, l_quantity, COUNT(*) AS c
            FROM lineitem GROUP BY 1, 2)
      QUALIFY row_number() OVER
        (PARTITION BY l_returnflag ORDER BY c DESC, l_quantity ASC) = 1)
    SELECT q.*, m.mode_qty FROM q JOIN m USING (l_returnflag)"""))

  /** Cumulative DISTINCT count over a window — SQL surface Spark's
    * window aggregates don't offer (`count(DISTINCT) OVER` is
    * unsupported), completed by the collect_set/size emulation: the
    * running number of distinct event types each user has produced.
    * State per frame is bounded by the DISTINCT-value cardinality
    * (event types here), not frame length — the property that keeps
    * the emulation viable at 100 TB; for unbounded-cardinality columns
    * the HLL sketch is the swap-in. Oracle runs DuckDB's native
    * windowed COUNT(DISTINCT). */
  private val x_rel_window_distinct = Q(
    "x_rel_window_distinct",
    (s, d) => {
      val e = Tables.events(s, d).filter(col("ts").isNotNull)
        .select(col("user_id"), col("event_id"),
          date_trunc("second", col("ts")).as("ts_s"), col("event_type"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_s"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.select(col("user_id"), col("event_id"), col("ts_s"),
        size(collect_set(col("event_type")).over(w)).cast("int")
          .as("n_distinct_types"))
    },
    Some("""SELECT user_id, event_id,
      date_trunc('second', ts) AS ts_s,
      CAST(COUNT(DISTINCT event_type) OVER (
        PARTITION BY user_id ORDER BY date_trunc('second', ts), event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER)
        AS n_distinct_types
    FROM events WHERE ts IS NOT NULL"""))

  /** Closed-form OLS regression (y = order value on x = items/order)
    * via the normal equations — slope, intercept and r² from five
    * EXACT sufficient statistics (integer Σx/Σx², decimal Σy/Σxy/Σy²),
    * finalized in double and rounded. One combinable aggregate per
    * statistic: the regression never materializes points, only sums —
    * the statistic-shipping shape that makes model fitting viable at
    * corpus scale. Spark's builtin regr_* run float accumulation;
    * these sums are order-independent, so the oracle replays them
    * bit-for-bit. */
  /** Poisson-bootstrap 95% CI for the mean order value
    * ([[Sampling.bootstrapMeanCi]], 32 replicas) — uncertainty
    * quantification at corpus scale: with-replacement resampling is
    * impossible row-local, but Poisson(1) multiplicities are not, so
    * every replica is a weighted pass whose exact-integer sums
    * partial-aggregate to 32 rows per partition. The inverse-CDF draw
    * shares the DP mechanism's embedded-thresholds discipline, so the
    * oracle replays every weight, replica mean, and quantile. Value
    * unit: integer cents. */
  private val x_stat_bootstrap = Q(
    "x_stat_bootstrap",
    (s, d) => Sampling.bootstrapMeanCi(
      Tables.orders(s, d), col("o_orderkey"),
      round(col("o_totalprice") * 100, 0)),
    Some(s"""WITH src AS (
      SELECT o_orderkey AS id0,
        CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100, 0) AS BIGINT) AS v0
      FROM orders),
    ${Sampling.bootstrapMeanCiSql("src")}
    SELECT n, point, ci_lo, ci_hi, n_replicas FROM __boot_out"""))

  /** Welch's unequal-variance t-test between two customer segments'
    * order values — the A/B significance test that, like the OLS
    * below, ships only SUFFICIENT STATISTICS: exact decimal Σy/Σy²
    * per segment (order-independent, combinable), then the t statistic
    * and Welch–Satterthwaite df finalized in double. Every float op is
    * +,−,×,÷,√ — all correctly rounded under IEEE 754 (no libm
    * transcendental), so t and df are bit-deterministic cross-engine
    * with NO micro-quantization needed; both rounded 6 dp for the
    * emit. `significant` = |t| > 1.96 (the asymptotic 5% bar; df here
    * is in the thousands where t ≈ z). */
  private val x_stat_ttest = Q(
    "x_stat_ttest",
    (s, d) => {
      val pts = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment").as("seg"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("y"))
      val stats = pts.groupBy(col("seg")).agg(
        count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("syy"))
        .select(col("seg"), col("n"),
          (col("sy").cast("double") / col("n").cast("double")).as("m"),
          ((col("syy").cast("double")
            - col("sy").cast("double") * col("sy").cast("double")
              / col("n").cast("double"))
            / (col("n") - 1).cast("double")).as("v"))
      val a = stats.filter(col("seg") === "BUILDING")
        .select(col("n").as("n1"), col("m").as("m1"), col("v").as("v1"))
      val b = stats.filter(col("seg") === "MACHINERY")
        .select(col("n").as("n2"), col("m").as("m2"), col("v").as("v2"))
      a.crossJoin(broadcast(b))
        .withColumn("se2", col("v1") / col("n1").cast("double")
          + col("v2") / col("n2").cast("double"))
        .select(col("n1"), col("n2"),
          round(col("m1") - col("m2"), 6).as("mean_diff"),
          round((col("m1") - col("m2")) / sqrt(col("se2")), 6).as("t"),
          round(col("se2") * col("se2") /
            ((col("v1") / col("n1")) * (col("v1") / col("n1"))
              / (col("n1") - 1).cast("double")
              + (col("v2") / col("n2")) * (col("v2") / col("n2"))
                / (col("n2") - 1).cast("double")), 6).as("df_welch"),
          (abs((col("m1") - col("m2")) / sqrt(col("se2")))
            > lit(1.96)).as("significant"))
    },
    Some("""WITH pts AS (
      SELECT c_mktsegment AS seg, CAST(o_totalprice AS DECIMAL(18,2)) AS y
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
    stx AS (
      SELECT seg, COUNT(*) AS n,
        CAST(SUM(y) AS DOUBLE) / COUNT(*) AS m,
        (CAST(SUM(y * y) AS DOUBLE)
          - CAST(SUM(y) AS DOUBLE) * CAST(SUM(y) AS DOUBLE) / COUNT(*))
          / (COUNT(*) - 1) AS v
      FROM pts GROUP BY 1),
    ab AS (
      SELECT a.n AS n1, a.m AS m1, a.v AS v1,
             b.n AS n2, b.m AS m2, b.v AS v2,
             a.v / a.n + b.v / b.n AS se2
      FROM (SELECT * FROM stx WHERE seg = 'BUILDING') a
      CROSS JOIN (SELECT * FROM stx WHERE seg = 'MACHINERY') b)
    SELECT n1, n2, ROUND(m1 - m2, 6) AS mean_diff,
      ROUND((m1 - m2) / sqrt(se2), 6) AS t,
      ROUND(se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
        + (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS df_welch,
      abs((m1 - m2) / sqrt(se2)) > CAST('1.96' AS DOUBLE) AS significant
    FROM ab"""))

  private val x_stat_ols = Q(
    "x_stat_ols",
    (s, d) => {
      val items = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("x"))
      val pts = Tables.orders(s, d)
        .join(items, Seq("o_orderkey"))
        .select(col("x"), col("o_totalprice").cast(DecimalType(18, 2)).as("y"))
      val stats = pts.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      stats.select(col("n"),
        round((col("n") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (col("n") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")), 6)
          .as("slope"),
        round((col("sy").cast("double") -
          ((col("n") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (col("n") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double"))) *
            col("sx").cast("double")) / col("n"), 6).as("intercept"),
        round(
          pow(col("n") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double"), 2) /
            ((col("n") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
              (col("n") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double"))), 6)
          .as("r2"))
    },
    Some("""WITH pts AS (
      SELECT i.x, CAST(o_totalprice AS DECIMAL(18,2)) AS y
      FROM orders
      JOIN (SELECT l_orderkey AS o_orderkey, COUNT(*) AS x
            FROM lineitem GROUP BY 1) i USING (o_orderkey)),
    st AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx,
             SUM(y) AS sy, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM pts)
    SELECT n,
      ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
        AS slope,
      ROUND((CAST(sy AS DOUBLE) -
        ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
          * CAST(sx AS DOUBLE)) / n, 6) AS intercept,
      ROUND(pow(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)
        / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        AS r2
    FROM st"""))

  /** Chi-squared independence test (event type × user cohort): exact
    * integer contingency counts; each cell's statistic finalized in
    * double and micro-quantized so the 49-term total is an
    * order-independent INTEGER sum (a raw double Σ would be
    * partition-order-dependent). The feature-selection / drift test in
    * its engine-exact form. */
  private val x_stat_chi2 = Q(
    "x_stat_chi2",
    (s, d) => {
      val base = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("event_type").isNotNull)
        .select(col("event_type").as("t"),
          pmod(col("user_id"), lit(7)).cast("int").as("cohort"))
      val cells = base.groupBy(col("t"), col("cohort"))
        .agg(count(lit(1)).as("o"))
      val rows = cells.groupBy(col("t")).agg(sum(col("o")).as("r"))
      val cols_ = cells.groupBy(col("cohort")).agg(sum(col("o")).as("c"))
      val n = cells.agg(sum(col("o")).as("nn"))
      cells.join(broadcast(rows), Seq("t"))
        .join(broadcast(cols_), Seq("cohort"))
        .crossJoin(broadcast(n))
        .select(col("t"), col("cohort"), col("o"),
          round((pow(col("o").cast("double") * col("nn") -
            col("r").cast("double") * col("c"), 2) /
            (col("r").cast("double") * col("c") * col("nn"))) * lit(1e6))
            .cast("long").as("chi2_cell_micro"))
    },
    Some("""WITH base AS (
      SELECT event_type AS t, CAST(user_id % 7 AS INTEGER) AS cohort
      FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    cells AS (SELECT t, cohort, COUNT(*) AS o FROM base GROUP BY 1, 2),
    r AS (SELECT t, SUM(o) AS r FROM cells GROUP BY 1),
    c AS (SELECT cohort, SUM(o) AS c FROM cells GROUP BY 1),
    n AS (SELECT SUM(o) AS nn FROM cells)
    SELECT t, cohort, o,
      CAST(ROUND((pow(CAST(o AS DOUBLE) * nn - CAST(r.r AS DOUBLE) * c.c, 2)
        / (CAST(r.r AS DOUBLE) * c.c * nn)) * 1e6) AS BIGINT)
        AS chi2_cell_micro
    FROM cells JOIN r USING (t) JOIN c USING (cohort) CROSS JOIN n"""))

  /** Benford expected first-digit probabilities log10(1 + 1/d),
    * computed ONCE in Scala and embedded as the same literals in both
    * engines — cross-engine log10() calls could differ at ulp level
    * (JVM vs C math library), identical literals cannot. Scala Double
    * toString round-trips, and both engines parse decimal literals to
    * the nearest binary double. */
  private val benfordP: Seq[(String, Double)] =
    (1 to 9).map(dd => dd.toString -> math.log10(1.0 + 1.0 / dd))

  /** Benford's-law first-significant-digit audit over order totals —
    * the fraud/data-entry screen (Nigrini's digit analysis) a finance
    * DQ suite runs on every monetary column: observed first-digit
    * shares vs the log10(1+1/d) expectation, with a per-digit χ² term.
    * The first digit comes from the INTEGER part's string head (floor
    * → BIGINT → first char) — canonical in both engines, where a
    * log10-based extraction would ride float rounding. Counts are
    * exact integers; shares and χ² terms are micro-quantized longs, so
    * any rollup of the 9 rows is an order-independent integer sum
    * (the [[x_stat_chi2]] discipline). One combinable groupBy over the
    * scan; the 9-row expectation broadcasts. */
  private val x_dq_benford = Q(
    "x_dq_benford",
    (s, d) => {
      import s.implicits._
      val exp = benfordP.toDF("digit", "p")
      val obs = Tables.orders(s, d).filter(col("o_totalprice") > 0)
        .select(substring(floor(col("o_totalprice")).cast("long")
          .cast("string"), 1, 1).as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      val n = obs.agg(sum(col("n_obs")).as("nn"))
      obs.join(broadcast(exp), Seq("digit"))
        .crossJoin(broadcast(n))
        .select(col("digit"), col("n_obs"),
          round(col("p") * 1e6).cast("long").as("expected_micro"),
          round(col("n_obs").cast("double") / col("nn").cast("double") * 1e6)
            .cast("long").as("observed_micro"),
          round(pow(col("n_obs").cast("double")
              - col("nn").cast("double") * col("p"), 2)
            / (col("nn").cast("double") * col("p")) * 1e6)
            .cast("long").as("chi2_cell_micro"))
    },
    Some {
      val vals = benfordP
        .map { case (dd, p) => s"('$dd', CAST($p AS DOUBLE))" }
        .mkString(", ")
      s"""WITH expd(digit, p) AS (VALUES $vals),
      obs AS (
        SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
            AS digit,
          COUNT(*) AS n_obs
        FROM orders WHERE o_totalprice > 0
        GROUP BY 1),
      n AS (SELECT SUM(n_obs) AS nn FROM obs)
      SELECT o.digit, o.n_obs,
        CAST(ROUND(p * 1e6) AS BIGINT) AS expected_micro,
        CAST(ROUND(CAST(n_obs AS DOUBLE) / CAST(nn AS DOUBLE) * 1e6) AS BIGINT)
          AS observed_micro,
        CAST(ROUND(pow(CAST(n_obs AS DOUBLE) - CAST(nn AS DOUBLE) * p, 2)
          / (CAST(nn AS DOUBLE) * p) * 1e6) AS BIGINT) AS chi2_cell_micro
      FROM obs o JOIN expd USING (digit) CROSS JOIN n"""
    })

  def all: Seq[Q] = Seq(
    x_rel_window_distinct,
    x_stat_ols,
    x_stat_chi2,
    x_stat_bootstrap,
    x_stat_ttest,
    x_dq_benford,
    x_rel_quantiles,
    x_rel_stats_suite,
    x_rel_lateral,
    x_rel_recursive,
    x_rel_grouping_sets,
    x_rel_arrays,
    x_rel_semi_anti,
    x_rel_rollup,
    x_rel_cube,
    x_rel_correlated_scalar,
    x_rel_in_notin,
    x_rel_pivot,
    x_rel_analytic_suite,
    x_rel_frames,
    x_rel_unpivot,
    x_rel_stringagg,
    x_rel_setops,
  )
}
