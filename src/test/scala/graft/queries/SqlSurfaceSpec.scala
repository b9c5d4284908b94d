package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.core.Tables

/** The reference's users write SQL (every layer of the pipeline is SQL
  * text); this spec proves the engine's semantics are reachable through
  * `spark.sql` as well as the DataFrame API: Spark-dialect twins of
  * representative §2 queries must be row-identical to the Registry's
  * DataFrame programs — including the cases where the DataFrame side
  * runs a REWRITTEN plan (one-pass conditional aggregation vs. the
  * SQL's literal 4-way full-outer join).
  *
  * Equality is exact (exceptAll both ways): the shared decimal-exact
  * aggregate discipline makes double outputs bit-stable across the two
  * entry surfaces.
  */
class SqlSurfaceSpec extends SparkSpec {

  private lazy val registered: Unit = {
    Tables.names.filter(_ != "events").foreach { t =>
      Tables.load(spark, sf001, t).createOrReplaceTempView(t)
    }
    // events needs the ns->us timestamp adaptation of its loader — the
    // raw parquet's TIMESTAMP(NANOS) is rejected by a plain scan
    Tables.events(spark, sf001).createOrReplaceTempView("events")
  }

  private def assertSame(name: String, sql: String): Unit = {
    registered
    val viaDf = Registry.queries(name)(spark, sf001)
    val viaSql = spark.sql(sql).select(viaDf.columns.map(org.apache.spark.sql.functions.col): _*)
    def diff(a: DataFrame, b: DataFrame) = a.exceptAll(b)
    assert(viaDf.count() == viaSql.count(), s"$name: row counts differ")
    assert(diff(viaDf, viaSql).isEmpty && diff(viaSql, viaDf).isEmpty,
      s"$name: SQL twin diverges from the DataFrame program")
  }

  test("q_a1 pricing summary via spark.sql") {
    assertSame("q_a1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        SUM(l_quantity) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus""")
  }

  test("flagship nation-month KPI (join + agg + lag window) via spark.sql") {
    assertSame("q_kpi_nation_month",
      """WITH agg AS (
        SELECT n.n_name AS nation,
          CAST(year(o.o_orderdate) AS INT) AS order_year,
          CAST(month(o.o_orderdate) AS INT) AS order_month,
          COUNT(*) AS n_orders,
          COUNT(DISTINCT o.o_custkey) AS n_customers,
          MIN(o.o_totalprice) AS min_price,
          MAX(o.o_totalprice) AS max_price,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2, 3)
      SELECT *,
        (CAST(n_orders AS DOUBLE)
          - CAST(LAG(n_orders) OVER (PARTITION BY nation ORDER BY order_year, order_month) AS DOUBLE))
          / CAST(LAG(n_orders) OVER (PARTITION BY nation ORDER BY order_year, order_month) AS DOUBLE)
          * 100.0 AS pct_change_orders
      FROM agg""")
  }

  test("J5 literal 4-way full-outer SQL equals the one-pass DataFrame rewrite") {
    assertSame("q_j5_kpi_4way",
      """WITH base AS (
        SELECT o_orderpriority AS priority,
          CAST(year(o_orderdate) AS INT) AS order_year,
          CAST(month(o_orderdate) AS INT) AS order_month,
          o_orderstatus, o_totalprice
        FROM orders),
      t AS (SELECT priority, order_year, order_month, COUNT(*) AS ct_total,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_total
            FROM base GROUP BY 1,2,3),
      op AS (SELECT priority, order_year, order_month, COUNT(*) AS ct_open,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_open
            FROM base WHERE o_orderstatus = 'O' GROUP BY 1,2,3),
      f AS (SELECT priority, order_year, order_month, COUNT(*) AS ct_finished,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_finished
            FROM base WHERE o_orderstatus = 'F' GROUP BY 1,2,3),
      h AS (SELECT priority, order_year, order_month, COUNT(*) AS ct_high,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_high
            FROM base WHERE o_totalprice > 400000.0 GROUP BY 1,2,3)
      SELECT * FROM t
      FULL OUTER JOIN op USING (priority, order_year, order_month)
      FULL OUTER JOIN f USING (priority, order_year, order_month)
      FULL OUTER JOIN h USING (priority, order_year, order_month)""")
  }

  test("ROLLUP subtotals via spark.sql") {
    assertSame("x_rel_rollup",
      """SELECT o_orderpriority AS priority, o_orderstatus AS status,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        CAST(grouping_id(o_orderpriority, o_orderstatus) AS INT) AS gid
      FROM orders
      GROUP BY ROLLUP(o_orderpriority, o_orderstatus)""")
  }
}
