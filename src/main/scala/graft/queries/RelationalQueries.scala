package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Exact, Tables}

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

  def all: Seq[Q] = Seq(
    x_rel_semi_anti,
    x_rel_rollup,
    x_rel_pivot,
    x_rel_analytic_suite,
  )
}
