package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Exact
import graft.ops.Kpis

/** Datamart layer: the four KPI views (populate.py:507–925) — each the
  * self-join-of-aggregates pattern (J5) over fact_listing: independently
  * filtered aggregates FULL OUTER joined on the grouping keys, plus LAG
  * month-over-month deltas (W4) and ratio columns (A8).
  *
  * Views are lazy DataFrames (CREATE OR REPLACE VIEW ≙
  * createOrReplaceTempView at the orchestrator).
  */
object Datamart {

  /** Estimated monthly revenue per listing:
    * (30 - availability_30) * price (populate.py:572–577). */
  private def estRevenue: Column =
    (lit(30) - col("availability_30")) * col("price")

  /** KPI 1 / 1-raw (populate.py:506–622, 628–743): per (area, year,
    * month) — the area key is `neighbourhood_lga` for the cleaned view
    * and `neighbourhood_cleansed` for the raw cross-check view (the
    * reference's duplicate-implementation habit, populate.py:625–627). */
  def kpiNeighbourhoodMonth(fact: DataFrame, areaCol: String): DataFrame = {
    val keys = Seq("area", "file_year", "file_month")
    def grouped(df: DataFrame) =
      df.groupBy(col(areaCol).as("area"), col("file_year"), col("file_month"))
    val total = grouped(fact).agg(
      count(lit(1)).as("n_listings"),
      countDistinct(col("host_id")).as("n_hosts"),
      min(col("price")).cast("double").as("min_price"),
      max(col("price")).cast("double").as("max_price"),
      median(col("price")).as("median_price"),
      Exact.avgMoney(col("price")).as("avg_price"))
    val active = grouped(fact.filter(col("has_availability") === "t")).agg(
      count(lit(1)).as("n_active"),
      Exact.sumMoney(estRevenue).as("est_revenue_active"))
    val superhost = grouped(fact.filter(col("host_is_superhost") === "t")).agg(
      countDistinct(col("host_id")).as("n_superhosts"))
    val inactive = grouped(fact.filter(col("has_availability") === "f")).agg(
      count(lit(1)).as("n_inactive"))
    val joined = Kpis.fullOuterOfAggs(keys, Seq(total, active, superhost, inactive))
      .withColumn("active_rate",
        round(col("n_active").cast("double") / col("n_listings").cast("double") * 100.0, 2))
      .withColumn("superhost_rate",
        round(col("n_superhosts").cast("double") / col("n_hosts").cast("double") * 100.0, 2))
    Kpis.lagPctChange(joined, Seq("area"), Seq("file_year", "file_month"),
      "n_active", "pct_change_active")
  }

  /** KPI 2 (populate.py:747–880): per (property_type, room_type,
    * accommodates, year, month) — the 5-key variant. */
  def kpiPropertyTypeMonth(fact: DataFrame): DataFrame = {
    val keys = Seq("property_type", "room_type", "accommodates", "file_year", "file_month")
    def grouped(df: DataFrame) = df.groupBy(keys.map(col): _*)
    val total = grouped(fact).agg(
      count(lit(1)).as("n_listings"),
      countDistinct(col("host_id")).as("n_hosts"),
      median(col("price")).as("median_price"),
      Exact.avgMoney(col("price")).as("avg_price"))
    val active = grouped(fact.filter(col("has_availability") === "t")).agg(
      count(lit(1)).as("n_active"),
      Exact.sumMoney(estRevenue).as("est_revenue_active"))
    val inactive = grouped(fact.filter(col("has_availability") === "f")).agg(
      count(lit(1)).as("n_inactive"))
    val joined = Kpis.fullOuterOfAggs(keys, Seq(total, active, inactive))
    Kpis.lagPctChange(joined, keys.take(3), Seq("file_year", "file_month"),
      "n_active", "pct_change_active")
  }

  /** KPI 3 (populate.py:886–925): host-side monthly rollup per
    * (host_lga, year, month). */
  def kpiHostMonth(fact: DataFrame): DataFrame = {
    val keys = Seq("host_lga", "file_year", "file_month")
    def grouped(df: DataFrame) = df.groupBy(keys.map(col): _*)
    val total = grouped(fact).agg(
      countDistinct(col("host_id")).as("n_hosts"),
      count(lit(1)).as("n_listings"),
      Exact.avgMoney(col("price")).as("avg_price"))
    val active = grouped(fact.filter(col("has_availability") === "t")).agg(
      count(lit(1)).as("n_active"),
      Exact.sumMoney(estRevenue).as("est_revenue_active"))
    Kpis.fullOuterOfAggs(keys, Seq(total, active))
  }
}
