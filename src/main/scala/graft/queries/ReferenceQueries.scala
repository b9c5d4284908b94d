package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Exact, Tables}
import graft.ops.{Cleanse, Kpis, Qualify}

/** SURVEY §2 operator inventory re-expressed over the driver testdata,
  * each with a DuckDB oracle. Reference sites cited per query.
  *
  * Numeric discipline (SURVEY §7.5.1): money aggregates use exact decimal
  * arithmetic internally and cast to double at the end (see
  * [[graft.core.Exact]]) so Spark's parallel aggregation order cannot
  * perturb results vs the single-threaded oracle.
  */
object ReferenceQueries {

  // ---------------------------------------------------------------- helpers

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)

  /** year/month of a timestamp col, as INT on both sides. */
  private def ym(c: Column): (Column, Column) = (year(c), month(c))

  // ---------------------------------------------------------------- queries

  /** A1–A7 + P7: TPC-H-Q1-shaped pricing summary. Plays the reference's
    * grouped KPI aggregates (workfile_populate_data_warehouse.py:552–577)
    * with the snapshot-validity date filter (design.sql:543). */
  private val q_a1_pricing_summary = Q(
    "q_a1_pricing_summary",
    (s, d) => {
      li(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"), // integral doubles: exact
          Exact.sumMoney(col("l_extendedprice")).as("sum_base_price"),
          Exact.sumRevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          Exact.avgMoney(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      SUM(l_quantity) AS sum_qty,
      ${Exact.sumMoneySql("l_extendedprice")} AS sum_base_price,
      ${Exact.sumRevenueSql("l_extendedprice", "l_discount")} AS sum_disc_price,
      ${Exact.avgMoneySql("l_extendedprice")} AS avg_price,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus"""))

  /** Flagship (SURVEY §7.2): per (nation, order year/month) — counts,
    * distinct customers, min/max/avg totalprice, exact revenue, and LAG
    * month-over-month pct change (W4, populate.py:569–570). Exercises
    * scan→join(J6)→groupBy(A1–A7)→window(W4). */
  private val q_kpi_nation_month = Q(
    "q_kpi_nation_month",
    (s, d) => {
      val (yy, mm) = ym(col("o_orderdate"))
      val agg = ord(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), yy.as("order_year"), mm.as("order_month"))
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          Exact.avgMoney(col("o_totalprice")).as("avg_price"),
          Exact.sumMoney(col("o_totalprice")).as("total_price"))
      Kpis.lagPctChange(agg, Seq("nation"), Seq("order_year", "order_month"),
        "n_orders", "pct_change_orders")
    },
    Some(s"""WITH agg AS (
      SELECT n.n_name AS nation,
        CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
        CAST(month(o.o_orderdate) AS INTEGER) AS order_month,
        COUNT(*) AS n_orders,
        COUNT(DISTINCT o.o_custkey) AS n_customers,
        MIN(o.o_totalprice) AS min_price,
        MAX(o.o_totalprice) AS max_price,
        ${Exact.avgMoneySql("o_totalprice")} AS avg_price,
        ${Exact.sumMoneySql("o_totalprice")} AS total_price
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2, 3)
    SELECT *,
      (CAST(n_orders AS DOUBLE) - CAST(LAG(n_orders) OVER w AS DOUBLE))
        / CAST(LAG(n_orders) OVER w AS DOUBLE) * 100.0 AS pct_change_orders
    FROM agg
    WINDOW w AS (PARTITION BY nation ORDER BY order_year, order_month)"""))

  /** P9/W1/W7: QUALIFY row_number dedup — keep first lineitem row per
    * order (design.sql:265–266 keyed dedup; deterministic tiebreak per
    * SURVEY §7.5.5). Runs as the hash-aggregate form (Qualify.dedupAgg):
    * map-side partial min_by combine instead of the window's full
    * shuffle+sort — QualifySpec proves result equality to the window
    * form and asserts the partial-aggregate plan shape. */
  private val q_p9_qualify_dedup = Q(
    "q_p9_qualify_dedup",
    (s, d) => {
      Qualify.dedupAgg(
        li(s, d).select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"), col("l_extendedprice")),
        keys = Seq(col("l_orderkey")),
        // (l_orderkey, l_linenumber) is NOT unique in the testdata, so
        // order by every projected column for a deterministic pick
        // (SURVEY §7.5.5: dedup-tie nondeterminism).
        orderCols = Seq(col("l_linenumber"), col("l_partkey"),
          col("l_extendedprice"), col("l_quantity")))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey
      ORDER BY l_linenumber, l_partkey, l_extendedprice, l_quantity) = 1"""))

  /** J5: the reference's self-join-of-aggregates KPI pattern — 4
    * independently filtered aggregates of orders FULL OUTER joined on the
    * grouping keys (populate.py:552–619; 3-key variant of KPI1). The
    * high-price arm is sparse so real outer-null rows appear. */
  private val q_j5_kpi_4way = Q(
    "q_j5_kpi_4way",
    (s, d) => {
      val (yy, mm) = ym(col("o_orderdate"))
      // Runs as the one-pass conditional-aggregation form
      // (Kpis.fullOuterOfAggsOnePass): one scan + one shuffle instead of
      // the literal 4 scans + 3 full-outer joins; KpisSpec proves output
      // equality to the join form, the oracle below stays the join SQL.
      Kpis.fullOuterOfAggsOnePass(
        ord(s, d),
        Seq(col("o_orderpriority").as("priority"), yy.as("order_year"), mm.as("order_month")),
        Seq(
          Kpis.AggArm(None, "ct_total",
            Seq("rev_total" -> col("o_totalprice"))),
          Kpis.AggArm(Some(col("o_orderstatus") === "O"), "ct_open",
            Seq("rev_open" -> col("o_totalprice"))),
          Kpis.AggArm(Some(col("o_orderstatus") === "F"), "ct_finished",
            Seq("rev_finished" -> col("o_totalprice"))),
          Kpis.AggArm(Some(col("o_totalprice") > 400000.0), "ct_high",
            Seq("rev_high" -> col("o_totalprice")))))
    },
    Some(s"""WITH base AS (
      SELECT o_orderpriority AS priority,
        CAST(year(o_orderdate) AS INTEGER) AS order_year,
        CAST(month(o_orderdate) AS INTEGER) AS order_month,
        o_orderstatus, o_totalprice
      FROM orders),
    t AS (SELECT priority, order_year, order_month, COUNT(*) AS ct_total,
            ${Exact.sumMoneySql("o_totalprice")} AS rev_total
          FROM base GROUP BY 1,2,3),
    op AS (SELECT priority, order_year, order_month, COUNT(*) AS ct_open,
            ${Exact.sumMoneySql("o_totalprice")} AS rev_open
          FROM base WHERE o_orderstatus = 'O' GROUP BY 1,2,3),
    f AS (SELECT priority, order_year, order_month, COUNT(*) AS ct_finished,
            ${Exact.sumMoneySql("o_totalprice")} AS rev_finished
          FROM base WHERE o_orderstatus = 'F' GROUP BY 1,2,3),
    h AS (SELECT priority, order_year, order_month, COUNT(*) AS ct_high,
            ${Exact.sumMoneySql("o_totalprice")} AS rev_high
          FROM base WHERE o_totalprice > 400000.0 GROUP BY 1,2,3)
    SELECT * FROM t
    FULL OUTER JOIN op USING (priority, order_year, order_month)
    FULL OUTER JOIN f USING (priority, order_year, order_month)
    FULL OUTER JOIN h USING (priority, order_year, order_month)"""))

  /** J5 at KPI2's arity (populate.py:797–879 groups by FIVE keys:
    * property_type, room_type, accommodates, year, month): the same
    * full-outer-of-filtered-aggregates pattern over a 5-key grain, run
    * as the one-pass conditional aggregation; the oracle stays the
    * literal 3-scan + 2-full-outer-join SQL. */
  private val q_j5b_kpi2_5key = Q(
    "q_j5b_kpi2_5key",
    (s, d) => Kpis.fullOuterOfAggsOnePass(
      li(s, d),
      Seq(col("l_returnflag").as("rflag"), col("l_linestatus").as("lstatus"),
        col("l_linenumber").as("linenum"),
        year(col("l_shipdate")).as("ship_year"),
        month(col("l_shipdate")).as("ship_month")),
      Seq(
        Kpis.AggArm(None, "ct_total",
          Seq("rev_total" -> col("l_extendedprice"))),
        Kpis.AggArm(Some(col("l_discount") > lit(0.05)), "ct_disc",
          Seq("rev_disc" -> col("l_extendedprice"))),
        Kpis.AggArm(Some(col("l_quantity") >= lit(25.0)), "ct_bulk",
          Seq("rev_bulk" -> col("l_extendedprice"))))),
    Some(s"""WITH base AS (
      SELECT l_returnflag AS rflag, l_linestatus AS lstatus,
        l_linenumber AS linenum,
        CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        CAST(month(l_shipdate) AS INTEGER) AS ship_month,
        l_extendedprice, l_discount, l_quantity
      FROM lineitem),
    t AS (SELECT rflag, lstatus, linenum, ship_year, ship_month,
            COUNT(*) AS ct_total,
            ${Exact.sumMoneySql("l_extendedprice")} AS rev_total
          FROM base GROUP BY 1,2,3,4,5),
    d AS (SELECT rflag, lstatus, linenum, ship_year, ship_month,
            COUNT(*) AS ct_disc,
            ${Exact.sumMoneySql("l_extendedprice")} AS rev_disc
          FROM base WHERE l_discount > CAST(0.05 AS DOUBLE) GROUP BY 1,2,3,4,5),
    b AS (SELECT rflag, lstatus, linenum, ship_year, ship_month,
            COUNT(*) AS ct_bulk,
            ${Exact.sumMoneySql("l_extendedprice")} AS rev_bulk
          FROM base WHERE l_quantity >= CAST(25.0 AS DOUBLE) GROUP BY 1,2,3,4,5)
    SELECT * FROM t
    FULL OUTER JOIN d USING (rflag, lstatus, linenum, ship_year, ship_month)
    FULL OUTER JOIN b USING (rflag, lstatus, linenum, ship_year, ship_month)"""))

  /** J5 with a NULLABLE grouping key — the regime of the reference's
    * kpi_neighbourhood_month_raw / kpi_property_type views, whose keys
    * come uncoalesced from the raw scrape (populate.py:628–743,
    * 747–880). SQL join equality never matches NULL, so the literal
    * FULL OUTER JOIN emits one row PER MATCHED ARM for a NULL-keyed
    * group; the one-pass rewrite reproduces that split post-aggregation
    * (Kpis.fullOuterOfAggsOnePassArms). The oracle is the literal join
    * SQL in DuckDB — an independent engine pins the semantics.
    * nullif() manufactures a fat NULL group from a non-null column. */
  private val q_j5c_null_key_split = Q(
    "q_j5c_null_key_split",
    (s, d) => Kpis.fullOuterOfAggsOnePass(
      Tables.customer(s, d),
      Seq(nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
        col("c_nationkey").as("nation_key")),
      Seq(
        Kpis.AggArm(None, "ct_total",
          Seq("bal_total" -> col("c_acctbal"))),
        Kpis.AggArm(Some(col("c_acctbal") > 0.0), "ct_pos",
          Seq("bal_pos" -> col("c_acctbal"))),
        // sparse arm: most (seg, nation) groups have no such customer
        Kpis.AggArm(Some(col("c_acctbal") > 9900.0), "ct_rich",
          Seq("bal_rich" -> col("c_acctbal"))))),
    Some(s"""WITH base AS (
      SELECT nullif(c_mktsegment, 'BUILDING') AS seg,
        c_nationkey AS nation_key, c_acctbal
      FROM customer),
    t AS (SELECT seg, nation_key, COUNT(*) AS ct_total,
            ${Exact.sumMoneySql("c_acctbal")} AS bal_total
          FROM base GROUP BY 1,2),
    p AS (SELECT seg, nation_key, COUNT(*) AS ct_pos,
            ${Exact.sumMoneySql("c_acctbal")} AS bal_pos
          FROM base WHERE c_acctbal > CAST(0.0 AS DOUBLE) GROUP BY 1,2),
    r AS (SELECT seg, nation_key, COUNT(*) AS ct_rich,
            ${Exact.sumMoneySql("c_acctbal")} AS bal_rich
          FROM base WHERE c_acctbal > CAST(9900.0 AS DOUBLE) GROUP BY 1,2)
    SELECT * FROM t
    FULL OUTER JOIN p USING (seg, nation_key)
    FULL OUTER JOIN r USING (seg, nation_key)"""))

  /** W2: global ROW_NUMBER best/worst pick (adhoc.sql:17–23) — the single
    * best and worst order by totalprice, unique tiebreak on key. Runs as
    * Kpis.globalBestWorst (TakeOrderedAndProject + one rank-count pass)
    * rather than the literal single-partition global window — identical
    * output, distributed plan (KpisSpec proves equality to the window
    * form). */
  private val q_w2_best_worst = Q(
    "q_w2_best_worst",
    (s, d) => Kpis.globalBestWorst(
      ord(s, d).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      metric = "o_totalprice", tiebreak = "o_orderkey"),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice,
      CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk_best,
      CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice ASC, o_orderkey) AS INTEGER) AS rk_worst
    FROM orders
    QUALIFY rk_best = 1 OR rk_worst = 1"""))

  /** O3 + J7: top-5 nations by exact revenue (ORDER BY+LIMIT with unique
    * tiebreak, adhoc.sql:50–60) LEFT JOINed back to a per-(nation, segment)
    * aggregate, restricting it to the top-k groups (adhoc.sql:63–76). */
  private val q_j7_top5_restrict = Q(
    "q_j7_top5_restrict",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val nat = Tables.nation(s, d)
      val joined = ord(s, d)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      val top5 = joined
        .groupBy(col("n_name").as("nation"))
        .agg(Exact.sumMoney(col("o_totalprice")).as("nation_revenue"))
        .orderBy(col("nation_revenue").desc, col("nation"))
        .limit(5)
      val perSeg = joined
        .groupBy(col("n_name").as("nation"), col("c_mktsegment").as("segment"))
        .agg(Exact.avgMoney(col("o_totalprice")).as("avg_price"),
          count(lit(1)).as("n_orders"))
      top5.join(perSeg, Seq("nation"), "left")
    },
    Some(s"""WITH joined AS (
      SELECT n.n_name AS nation, c.c_mktsegment AS segment, o.o_totalprice
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey),
    top5 AS (
      SELECT nation, ${Exact.sumMoneySql("o_totalprice")} AS nation_revenue
      FROM joined GROUP BY nation
      ORDER BY nation_revenue DESC, nation LIMIT 5),
    per_seg AS (
      SELECT nation, segment,
        ${Exact.avgMoneySql("o_totalprice")} AS avg_price,
        COUNT(*) AS n_orders
      FROM joined GROUP BY nation, segment)
    SELECT t.nation, t.nation_revenue, p.segment, p.avg_price, p.n_orders
    FROM top5 t LEFT JOIN per_seg p ON t.nation = p.nation"""))

  /** F1–F12 scalar suite over part+supplier strings (SURVEY §2.8):
    * split_part (±n), trim/upper, replace chain, try_cast, CASE buckets,
    * isin, arithmetic. */
  private val q_f_scalar_suite = Q(
    "q_f_scalar_suite",
    (s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        Cleanse.splitPart(col("p_type"), " ", 1).as("type_first"),
        Cleanse.splitPart(col("p_type"), " ", -1).as("type_last"),
        upper(trim(col("p_brand"))).as("brand_up"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("name_underscored"),
        Cleanse.splitPart(col("p_brand"), "#", 2).try_cast("int").as("brand_num"),
        when(col("p_size") <= 10, "SMALL")
          .when(col("p_size") <= 30, "MEDIUM")
          .otherwise("LARGE").as("size_bucket"),
        col("p_brand").isin("Brand#11", "Brand#22", "Brand#33").as("is_focus_brand"),
        (col("p_retailprice").cast("decimal(18,2)") * 12).cast("double").as("annual_price"))
    },
    Some("""SELECT p_partkey,
      split_part(p_type, ' ', 1) AS type_first,
      split_part(p_type, ' ', -1) AS type_last,
      upper(trim(p_brand)) AS brand_up,
      regexp_replace(p_name, ' ', '_', 'g') AS name_underscored,
      TRY_CAST(split_part(p_brand, '#', 2) AS INTEGER) AS brand_num,
      CASE WHEN p_size <= 10 THEN 'SMALL'
           WHEN p_size <= 30 THEN 'MEDIUM'
           ELSE 'LARGE' END AS size_bucket,
      p_brand IN ('Brand#11', 'Brand#22', 'Brand#33') AS is_focus_brand,
      CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 12 AS DOUBLE) AS annual_price
    FROM part"""))

  /** F5/F6/F7 + P7: date-function suite — year/month extraction, month
    * start via make_date (design.sql:447), month end via last_day
    * (design.sql:543), and the snapshot-validity month-window filter
    * against an INDEPENDENT snapshot date (the reference's file_date):
    * keep only rows whose date falls inside the snapshot file's month,
    * like `last_scraped BETWEEN file_date AND last_day(file_date)`. */
  private val q_f_date_suite = Q(
    "q_f_date_suite",
    (s, d) => {
      val (yy, mm) = ym(col("o_orderdate"))
      val fileDate = lit("1997-06-01").cast("date") // snapshot month
      ord(s, d)
        .select(col("o_orderkey"), col("o_orderdate"),
          yy.as("order_year"), mm.as("order_month"),
          Cleanse.monthStart(yy, mm).as("month_start"),
          last_day(col("o_orderdate")).as("month_end"))
        .filter(Cleanse.withinMonthOf(col("o_orderdate").cast("date"), fileDate))
    },
    Some("""SELECT o_orderkey, o_orderdate,
      CAST(year(o_orderdate) AS INTEGER) AS order_year,
      CAST(month(o_orderdate) AS INTEGER) AS order_month,
      make_date(CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER), 1) AS month_start,
      last_day(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1997-06-01'
      AND CAST(o_orderdate AS DATE) <= last_day(DATE '1997-06-01')"""))

  /** A6: exact interpolated median + quartiles via percentile_cont
    * (populate.py:564,685,813 — PERCENTILE_CONT(0.5) WITHIN GROUP). */
  private val q_a6_median = Q(
    "q_a6_median",
    (s, d) => ord(s, d)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(
        median(col("o_totalprice")).as("median_price"),
        percentile(col("o_totalprice"), lit(0.25)).as("p25_price"),
        percentile(col("o_totalprice"), lit(0.75)).as("p75_price"),
        count(lit(1)).as("n_orders")),
    Some("""SELECT o_orderpriority AS priority,
      median(o_totalprice) AS median_price,
      quantile_cont(o_totalprice, 0.25) AS p25_price,
      quantile_cont(o_totalprice, 0.75) AS p75_price,
      COUNT(*) AS n_orders
    FROM orders GROUP BY 1"""))

  /** A9: the reference's repeated-scalar-subquery pattern
    * (adhoc.sql:181–188) — N counts of one CTE under different
    * predicates + a global scalar — rewritten as ONE conditional
    * aggregation pass plus a cross join of a 1-row aggregate (the
    * scale-correct rewrite; 2 scans instead of 6). */
  private val q_a9_scalar_subquery = Q(
    "q_a9_scalar_subquery",
    (s, d) => {
      val perCust = ord(s, d).groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      val buckets = Kpis.conditionalCounts(perCust, Map(
        "n_cust_single" -> (col("n_orders") === 1),
        "n_cust_2_5" -> (col("n_orders").between(2, 5)),
        "n_cust_6plus" -> (col("n_orders") >= 6)))
      val total = perCust.agg(count(lit(1)).as("n_cust_total"))
      buckets.crossJoin(total)
        .withColumn("pct_single",
          round(col("n_cust_single").cast("double") / col("n_cust_total").cast("double") * 100.0, 2))
    },
    Some("""WITH per_cust AS (
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1)
    SELECT
      (SELECT COUNT(*) FROM per_cust WHERE n_orders = 1) AS n_cust_single,
      (SELECT COUNT(*) FROM per_cust WHERE n_orders BETWEEN 2 AND 5) AS n_cust_2_5,
      (SELECT COUNT(*) FROM per_cust WHERE n_orders >= 6) AS n_cust_6plus,
      (SELECT COUNT(*) FROM per_cust) AS n_cust_total,
      ROUND(CAST((SELECT COUNT(*) FROM per_cust WHERE n_orders = 1) AS DOUBLE)
        / CAST((SELECT COUNT(*) FROM per_cust) AS DOUBLE) * 100.0, 2) AS pct_single"""))

  /** A10: SELECT DISTINCT projection dedup (design.sql:170,545;
    * adhoc.sql:25,87,...). */
  private val q_a10_distinct = Q(
    "q_a10_distinct",
    (s, d) => ord(s, d).select(col("o_orderpriority"), col("o_orderstatus")).distinct(),
    Some("SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders"))

  /** W3: RANK top-1-with-ties per group (adhoc.sql:77 QUALIFY RANK()=1):
    * best revenue month per priority, keeping ties. Revenue is exact
    * decimal so tie behavior is engine-independent. */
  private val q_w3_rank_top1 = Q(
    "q_w3_rank_top1",
    (s, d) => {
      val (yy, mm) = ym(col("o_orderdate"))
      val monthly = ord(s, d)
        .groupBy(col("o_orderpriority").as("priority"), yy.as("order_year"), mm.as("order_month"))
        .agg(Exact.sumMoney(col("o_totalprice")).as("rev"))
      Qualify.rank(monthly, Seq(col("priority")), Seq(col("rev").desc))
    },
    Some(s"""WITH monthly AS (
      SELECT o_orderpriority AS priority,
        CAST(year(o_orderdate) AS INTEGER) AS order_year,
        CAST(month(o_orderdate) AS INTEGER) AS order_month,
        ${Exact.sumMoneySql("o_totalprice")} AS rev
      FROM orders GROUP BY 1, 2, 3)
    SELECT priority, order_year, order_month, rev FROM monthly
    QUALIFY RANK() OVER (PARTITION BY priority ORDER BY rev DESC) = 1"""))

  /** W5+W6+F8: whole-partition window SUM (design.sql:174; exact decimal
    * internally — double window-sums are accumulation-order-dependent),
    * window COUNT (adhoc.sql:90–92), then range bucketing of the window
    * result (adhoc.sql:93–96) and a per-bucket rollup — the adhoc-c
    * shape. */
  private val q_w5_w6_window_suite = Q(
    "q_w5_w6_window_suite",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byCust = Window.partitionBy(col("o_custkey"))
      val enriched = ord(s, d).select(
          col("o_custkey"), col("o_totalprice"),
          count(lit(1)).over(byCust).as("n_orders_cust"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(byCust)
            .cast("double").as("cust_revenue"))
      enriched
        .select(col("o_custkey"), col("n_orders_cust"), col("cust_revenue"),
          when(col("n_orders_cust") === 1, "SINGLE")
            .when(col("n_orders_cust").between(2, 5), "REGULAR")
            .otherwise("FREQUENT").as("bucket"))
        .distinct()
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_customers"),
          Exact.sumMoney(col("cust_revenue")).as("bucket_revenue"))
    },
    Some("""WITH enriched AS (
      SELECT o_custkey,
        COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders_cust,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS DOUBLE) AS cust_revenue
      FROM orders),
    bucketed AS (
      SELECT DISTINCT o_custkey, n_orders_cust, cust_revenue,
        CASE WHEN n_orders_cust = 1 THEN 'SINGLE'
             WHEN n_orders_cust BETWEEN 2 AND 5 THEN 'REGULAR'
             ELSE 'FREQUENT' END AS bucket
      FROM enriched)
    SELECT bucket, COUNT(*) AS n_customers,
      CAST(SUM(CAST(cust_revenue AS DECIMAL(18,2))) AS DOUBLE) AS bucket_revenue
    FROM bucketed GROUP BY 1"""))

  /** F8 (large literal map) + P10 (LIKE) + F10 (isin): the reference's
    * ~25-branch suburb→LGA CASE tables (design.sql:477–541) as a
    * literal-map column over the nation dimension, with LIKE predicates. */
  private val q_f8_lookup_map = Q(
    "q_f8_lookup_map",
    (s, d) => Tables.nation(s, d).select(
      col("n_name"),
      Cleanse.literalMap(col("n_name"),
        Seq("FRANCE" -> "EU-WEST", "GERMANY" -> "EU-WEST", "ROMANIA" -> "EU-EAST",
          "RUSSIA" -> "EU-EAST", "CHINA" -> "APAC", "JAPAN" -> "APAC",
          "INDIA" -> "APAC", "UNITED STATES" -> "AMER", "CANADA" -> "AMER",
          "BRAZIL" -> "AMER"),
        lit("OTHER")).as("zone"),
      col("n_name").like("%IA").as("ends_ia"),
      col("n_name").like("UNITED%").as("is_united"),
      col("n_name").isin("KENYA", "MOROCCO", "MOZAMBIQUE").as("is_focus")),
    Some("""SELECT n_name,
      CASE n_name WHEN 'FRANCE' THEN 'EU-WEST' WHEN 'GERMANY' THEN 'EU-WEST'
        WHEN 'ROMANIA' THEN 'EU-EAST' WHEN 'RUSSIA' THEN 'EU-EAST'
        WHEN 'CHINA' THEN 'APAC' WHEN 'JAPAN' THEN 'APAC' WHEN 'INDIA' THEN 'APAC'
        WHEN 'UNITED STATES' THEN 'AMER' WHEN 'CANADA' THEN 'AMER'
        WHEN 'BRAZIL' THEN 'AMER' ELSE 'OTHER' END AS zone,
      n_name LIKE '%IA' AS ends_ia,
      n_name LIKE 'UNITED%' AS is_united,
      n_name IN ('KENYA', 'MOROCCO', 'MOZAMBIQUE') AS is_focus
    FROM nation"""))

  /** J3/J6 at full star arity: the reference's fact-plus-dimensions
    * join shape (E2's 4 dimension joins, design.sql:461–464,545–548)
    * at warehouse scale — lineitem ⋈ part ⋈ supplier ⋈ nation ⋈
    * region ⋈ orders, profit per (nation, year, part type).
    *
    * Join order is the 100 TB plan, not the textual order: the
    * selective dimension filters cut the fact FIRST (part type ~1/3,
    * ASIA region ~1/5 via suppliers), so the expensive orders join
    * sees a twice-reduced fact. region⋈nation collapses to one
    * broadcast before touching the fact; part and supplier shuffle
    * (both grow with SF — only bounded dims get the broadcast hint,
    * AQE may still promote them at small SF). */
  private val q_j8_star_profit = Q(
    "q_j8_star_profit",
    (s, d) => {
      val asiaNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      li(s, d)
        .join(Tables.part(s, d).filter(col("p_type").isin("PROMO", "ECONOMY"))
            .select(col("p_partkey"), col("p_type")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .join(ord(s, d).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("order_year"),
          col("p_type").as("part_type"))
        .agg(Exact.sumRevenue(col("l_extendedprice"), col("l_discount")).as("profit"),
          count(lit(1)).as("n_lines"))
    },
    Some(s"""SELECT n.n_name AS nation,
      CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
      p.p_type AS part_type,
      ${Exact.sumRevenueSql("l_extendedprice", "l_discount")} AS profit,
      COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
      AND p.p_type IN ('PROMO', 'ECONOMY')
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2, 3"""))

  /** J1/J2: FULL OUTER join of two independently aggregated dimension
    * views with key coalescing (census G01⋈G02, design.sql:157–159;
    * SSC⋈LGA, design.sql:175–177). */
  private val q_j1_full_outer_dims = Q(
    "q_j1_full_outer_dims",
    (s, d) => {
      val su = Tables.supplier(s, d).groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_suppliers"))
      val cu = Tables.customer(s, d).groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"))
      su.join(cu, col("s_nationkey") === col("c_nationkey"), "full_outer")
        .select(coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
          col("n_suppliers"), col("n_customers"))
    },
    Some("""WITH su AS (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1),
    cu AS (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1)
    SELECT COALESCE(s_nationkey, c_nationkey) AS nationkey, n_suppliers, n_customers
    FROM su FULL OUTER JOIN cu ON s_nationkey = c_nationkey"""))

  /** §2.7: union-by-name across heterogeneous schemas — the notebook's
    * 74/102/106-column harmonization (preprocess.ipynb cells 11–17) —
    * via unionByName(allowMissingColumns): missing columns become NULL. */
  private val q_u1_union_by_name = Q(
    "q_u1_union_by_name",
    (s, d) => {
      val open = ord(s, d).filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      val finished = ord(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      open.unionByName(finished, allowMissingColumns = true)
    },
    Some("""SELECT o_orderkey, o_totalprice, o_orderpriority, NULL::BIGINT AS o_custkey
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL BY NAME
    SELECT o_orderkey, o_custkey, o_orderpriority, NULL::DOUBLE AS o_totalprice
    FROM orders WHERE o_orderstatus = 'F'"""))

  /** Composite ad-hoc query a (adhoc.sql:9–45): global best/worst group
    * by a metric via ROW_NUMBER (W2), restricted output joined back to
    * the census-like dimension (J6) with ratio columns (A8) — the whole
    * E3-style flow in one statement. */
  private val q_adhoc_a_composite = Q(
    "q_adhoc_a_composite",
    (s, d) => {
      val perNation = ord(s, d).filter(col("o_orderstatus") === "O")
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), col("n_regionkey").as("regionkey"))
        .agg(count(lit(1)).as("n_open_orders"),
          countDistinct(col("o_custkey")).as("n_customers"))
      // global (unpartitioned) windows are safe HERE ONLY because the
      // input is the per-nation aggregate — bounded at |nation| rows
      // regardless of fact size; for unbounded inputs use
      // Kpis.globalBestWorst (see q_w2_best_worst)
      val wBest = Window.orderBy(col("n_open_orders").desc, col("nation"))
      val wWorst = Window.orderBy(col("n_open_orders").asc, col("nation"))
      perNation
        .withColumn("rk_best", row_number().over(wBest))
        .withColumn("rk_worst", row_number().over(wWorst))
        .filter(col("rk_best") === 1 || col("rk_worst") === 1)
        .join(broadcast(Tables.region(s, d)), col("regionkey") === col("r_regionkey"))
        .select(col("nation"), col("r_name").as("region"),
          col("n_open_orders"), col("n_customers"),
          round(col("n_open_orders").cast("double") / col("n_customers").cast("double"), 2)
            .as("orders_per_customer"),
          col("rk_best"), col("rk_worst"))
    },
    Some("""WITH per_nation AS (
      SELECT n.n_name AS nation, n.n_regionkey AS regionkey,
        COUNT(*) AS n_open_orders,
        COUNT(DISTINCT o.o_custkey) AS n_customers
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderstatus = 'O'
      GROUP BY 1, 2),
    ranked AS (
      SELECT *,
        CAST(ROW_NUMBER() OVER (ORDER BY n_open_orders DESC, nation) AS INTEGER) AS rk_best,
        CAST(ROW_NUMBER() OVER (ORDER BY n_open_orders ASC, nation) AS INTEGER) AS rk_worst
      FROM per_nation)
    SELECT nation, r.r_name AS region, n_open_orders, n_customers,
      ROUND(CAST(n_open_orders AS DOUBLE) / CAST(n_customers AS DOUBLE), 2) AS orders_per_customer,
      rk_best, rk_worst
    FROM ranked JOIN region r ON regionkey = r.r_regionkey
    WHERE rk_best = 1 OR rk_worst = 1"""))

  /** Ad-hoc query b end-to-end (adhoc.sql:50–78): top-5 groups by an
    * average-revenue CTE (O3), LEFT-joined to a finer per-subtype
    * aggregate (J7), then QUALIFY RANK()=1 per group keeping ties (W3).
    * Testdata analogue: top-5 nations by avg open-order value; best
    * (priority, segment) per top nation by avg order value. The
    * aggregated per-type side is broadcast (build-right of the left
    * outer join — the probe side is the 5-row CTE). */
  private val q_adhoc_b_composite = Q(
    "q_adhoc_b_composite",
    (s, d) => {
      val joined = ord(s, d).filter(col("o_orderstatus") === "O")
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      val top5 = joined.groupBy(col("n_name").as("nation"))
        .agg(Exact.avgMoney(col("o_totalprice")).as("est_revenue"))
        .orderBy(col("est_revenue").desc, col("nation"))
        .limit(5)
      val perType = joined
        .groupBy(col("n_name").as("nation"), col("o_orderpriority").as("priority"),
          col("c_mktsegment").as("segment"))
        .agg(Exact.avgMoney(col("o_totalprice")).as("avg_price"),
          count(lit(1)).as("n_orders"))
      Qualify.rank(
        top5.join(broadcast(perType), Seq("nation"), "left"),
        Seq(col("nation")),
        Seq(col("avg_price").desc, col("priority"), col("segment")))
    },
    Some(s"""WITH joined AS (
      SELECT n.n_name AS nation, o.o_orderpriority AS priority,
        c.c_mktsegment AS segment, o.o_totalprice
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderstatus = 'O'),
    top5 AS (
      SELECT nation, ${Exact.avgMoneySql("o_totalprice")} AS est_revenue
      FROM joined GROUP BY nation
      ORDER BY est_revenue DESC, nation LIMIT 5),
    per_type AS (
      SELECT nation, priority, segment,
        ${Exact.avgMoneySql("o_totalprice")} AS avg_price,
        COUNT(*) AS n_orders
      FROM joined GROUP BY nation, priority, segment),
    j AS (
      SELECT t.nation, t.est_revenue, p.priority, p.segment, p.avg_price, p.n_orders
      FROM top5 t LEFT JOIN per_type p ON t.nation = p.nation)
    SELECT nation, est_revenue, priority, segment, avg_price, n_orders
    FROM (SELECT *, RANK() OVER (PARTITION BY nation ORDER BY avg_price DESC,
            priority, segment) AS rk FROM j)
    WHERE rk = 1"""))

  /** Ad-hoc query c end-to-end (adhoc.sql:84–150): dedup (A10) → tri-state
    * CASE flag (F8) → window counts over two partitionings (W6) → percent
    * bucketing (F8/F9) → ct>1 filter (P8) → scalar-subquery distinct
    * count (A9, as a broadcast 1-row aggregate) → second-level window
    * counts + ratio arithmetic → DISTINCT. Testdata analogue: do repeat
    * customers keep ordering with the same outcome (order status as the
    * same-neighbourhood stand-in)?
    *
    * Distributed shapes (same output as the literal translation, which
    * the oracle SQL still is): the per-(customer,flag) window count runs
    * as a hash aggregate with a per-customer window ON TOP of the
    * aggregate (≤3 rows per customer reach the window); the final
    * DISTINCT + COUNT-OVER-3-bucket windows — which would funnel every
    * row into ≤3 tasks at scale — run as ONE ROLLUP aggregate whose
    * grouping-total row carries the global totals, crossJoined back as
    * a broadcast ≤4-row frame (one pass over the CTE, not three). */
  private val q_adhoc_c_composite = Q(
    "q_adhoc_c_composite",
    (s, d) => {
      val flagged = ord(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        when(col("o_orderstatus") === "O", "TRUE")
          .when(col("o_orderstatus") === "F", "FALSE")
          .otherwise("NOT_SURE").as("flag"))
        .distinct() // unique (customer, order) pairs, adhoc.sql:124
      val wC = Window.partitionBy(col("o_custkey")) // bounded: ≤3 rows/cust
      val cte = flagged
        .groupBy(col("o_custkey"), col("flag"))
        .agg(count(lit(1)).as("ct_same"))
        .withColumn("ct_total", sum(col("ct_same")).over(wC))
        .withColumn("percent",
          floor(lit(100).cast("double") * col("ct_same").cast("double")
            / col("ct_total").cast("double")).cast("long"))
        .withColumn("percent_range",
          when(col("percent") === 100, "100%")
            .when(col("percent") >= 50, "50% - 99%")
            .otherwise("<50%"))
        .filter(col("ct_total") > 1)
      // Single pass over cte (the round-8 double-computation fix):
      // ROLLUP on percent_range yields both the per-range TRUE counts
      // and — in the grouping-total row — the global n_same_total and
      // COUNT(DISTINCT custkey) total_multi, so the orders scan +
      // window aggregation runs once instead of three times.
      // percent_range is never null (CASE has an ELSE), so isNull
      // unambiguously identifies the rollup total row; the ≤4-row
      // rollup result is localCheckpointed because two consumers read
      // it (multi-consumer rule).
      val rolled = cte.rollup(col("percent_range")).agg(
          count(when(col("flag") === "TRUE", lit(1))).as("n_true"),
          countDistinct(col("o_custkey")).as("n_cust"))
        .localCheckpoint(true)
      val totals = rolled.filter(col("percent_range").isNull)
        .select(col("n_true").as("n_same_total"),
          col("n_cust").as("total_multi"))
      rolled.filter(col("percent_range").isNotNull && col("n_true") > 0)
        .select(col("percent_range"), col("n_true").as("n_per_range"))
        .crossJoin(broadcast(totals))
        .select(col("percent_range"), col("n_per_range"), col("n_same_total"),
          col("total_multi"),
          (lit(100).cast("double") * col("n_per_range").cast("double")
            / col("n_same_total").cast("double")).as("pct_of_same_status"),
          (lit(100).cast("double") * col("n_per_range").cast("double")
            / col("total_multi").cast("double")).as("pct_of_multi_custs"))
    },
    Some("""WITH flagged AS (
      SELECT DISTINCT o_custkey, o_orderkey,
        CASE WHEN o_orderstatus = 'O' THEN 'TRUE'
             WHEN o_orderstatus = 'F' THEN 'FALSE'
             ELSE 'NOT_SURE' END AS flag
      FROM orders),
    lvl AS (
      SELECT DISTINCT o_custkey, flag,
        ct_same, ct_total,
        CAST(FLOOR(CAST(100 AS DOUBLE) * CAST(ct_same AS DOUBLE)
          / CAST(ct_total AS DOUBLE)) AS BIGINT) AS percent
      FROM (
        SELECT o_custkey, flag,
          COUNT(*) OVER (PARTITION BY o_custkey, flag) AS ct_same,
          COUNT(*) OVER (PARTITION BY o_custkey) AS ct_total
        FROM flagged)),
    cte AS (
      SELECT *,
        CASE WHEN percent = 100 THEN '100%'
             WHEN percent >= 50 THEN '50% - 99%'
             ELSE '<50%' END AS percent_range
      FROM lvl WHERE ct_total > 1),
    tm AS (SELECT COUNT(DISTINCT o_custkey) AS total_multi FROM cte),
    truth AS (SELECT cte.*, tm.total_multi FROM cte, tm WHERE flag = 'TRUE')
    SELECT DISTINCT percent_range,
      COUNT(*) OVER (PARTITION BY percent_range) AS n_per_range,
      COUNT(*) OVER (PARTITION BY flag) AS n_same_total,
      total_multi,
      CAST(100 AS DOUBLE) * CAST(COUNT(*) OVER (PARTITION BY percent_range) AS DOUBLE)
        / CAST(COUNT(*) OVER (PARTITION BY flag) AS DOUBLE) AS pct_of_same_status,
      CAST(100 AS DOUBLE) * CAST(COUNT(*) OVER (PARTITION BY percent_range) AS DOUBLE)
        / CAST(total_multi AS DOUBLE) AS pct_of_multi_custs
    FROM truth"""))

  /** Ad-hoc query d end-to-end (adhoc.sql:154–190): per-entity aggregate
    * restricted to single-listing hosts (A7/P8), LEFT join to the
    * dimension for a threshold (J6), then the 5 repeated scalar-subquery
    * coverage counts rewritten as ONE conditional-aggregation pass
    * (A9 — the oracle keeps the literal 5-subquery form). Testdata
    * analogue: can a single-order customer's order value cover 12×
    * account balance (and half / 20% of it)? */
  private val q_adhoc_d_composite = Q(
    "q_adhoc_d_composite",
    (s, d) => {
      val single = ord(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          Exact.sumMoney(col("o_totalprice")).as("revenue"))
        .filter(col("n_orders") === 1)
      val cte = single
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_custkey"), col("revenue"),
          (col("c_acctbal") * lit(12)).as("threshold"))
      val counts = Kpis.conditionalCounts(cte, Map(
        "n_total" -> lit(true),
        "n_cover_all" -> (col("revenue") >= col("threshold")),
        "n_cover_half" -> (col("revenue") >= col("threshold") * lit(0.5)),
        "n_cover_20pct" -> (col("revenue") >= col("threshold") * lit(0.2)),
        "n_cannot_cover" -> (col("revenue") < col("threshold"))))
      // guard the empty-input case: ANSI Spark errors on 0/0 where the
      // oracle's float division yields NULL/NaN — emit null explicitly
      def pct(n: String) =
        when(col("n_total") === 0, lit(null).cast("double"))
          .otherwise(round(col(n).cast("double") / col("n_total").cast("double") * 100.0, 2))
      counts
        .withColumn("pct_cover_all", pct("n_cover_all"))
        .withColumn("pct_cover_half", pct("n_cover_half"))
        .withColumn("pct_cover_20pct", pct("n_cover_20pct"))
        .withColumn("pct_cannot_cover", pct("n_cannot_cover"))
    },
    Some(s"""WITH single AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
        ${Exact.sumMoneySql("o_totalprice")} AS revenue
      FROM orders GROUP BY o_custkey HAVING COUNT(*) = 1),
    cte AS (
      SELECT s.o_custkey, s.revenue, c.c_acctbal * 12 AS threshold
      FROM single s LEFT JOIN customer c ON s.o_custkey = c.c_custkey)
    SELECT
      (SELECT COUNT(*) FROM cte WHERE revenue < threshold) AS n_cannot_cover,
      (SELECT COUNT(*) FROM cte WHERE revenue >= threshold * CAST(0.2 AS DOUBLE)) AS n_cover_20pct,
      (SELECT COUNT(*) FROM cte WHERE revenue >= threshold) AS n_cover_all,
      (SELECT COUNT(*) FROM cte WHERE revenue >= threshold * CAST(0.5 AS DOUBLE)) AS n_cover_half,
      (SELECT COUNT(*) FROM cte) AS n_total,
      ROUND(CAST((SELECT COUNT(*) FROM cte WHERE revenue >= threshold) AS DOUBLE)
        / CAST((SELECT COUNT(*) FROM cte) AS DOUBLE) * 100.0, 2) AS pct_cover_all,
      ROUND(CAST((SELECT COUNT(*) FROM cte WHERE revenue >= threshold * CAST(0.5 AS DOUBLE)) AS DOUBLE)
        / CAST((SELECT COUNT(*) FROM cte) AS DOUBLE) * 100.0, 2) AS pct_cover_half,
      ROUND(CAST((SELECT COUNT(*) FROM cte WHERE revenue >= threshold * CAST(0.2 AS DOUBLE)) AS DOUBLE)
        / CAST((SELECT COUNT(*) FROM cte) AS DOUBLE) * 100.0, 2) AS pct_cover_20pct,
      ROUND(CAST((SELECT COUNT(*) FROM cte WHERE revenue < threshold) AS DOUBLE)
        / CAST((SELECT COUNT(*) FROM cte) AS DOUBLE) * 100.0, 2) AS pct_cannot_cover"""))

  def all: Seq[Q] = Seq(
    q_adhoc_a_composite,
    q_adhoc_b_composite,
    q_adhoc_c_composite,
    q_adhoc_d_composite,
    q_a1_pricing_summary,
    q_kpi_nation_month,
    q_p9_qualify_dedup,
    q_j5_kpi_4way,
    q_j5b_kpi2_5key,
    q_j5c_null_key_split,
    q_w2_best_worst,
    q_j7_top5_restrict,
    q_j8_star_profit,
    q_f_scalar_suite,
    q_f_date_suite,
    q_a6_median,
    q_a9_scalar_subquery,
    q_a10_distinct,
    q_w3_rank_top1,
    q_w5_w6_window_suite,
    q_f8_lookup_map,
    q_j1_full_outer_dims,
    q_u1_union_by_name,
  )
}
