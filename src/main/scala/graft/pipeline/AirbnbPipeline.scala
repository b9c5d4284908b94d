package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference pipeline end-to-end (populate.py DAG, E1 trace):
  * raw CSVs → staging (census, location, listing) → warehouse
  * (dim_census, fact_listing) → datamart (4 KPI views).
  *
  * Airflow's task edges collapse into ordinary function composition —
  * Spark's lazy DAG subsumes the dependency graph — and the reference's
  * CTAS-per-layer materialization maps to `.cache()` on the two frames
  * every downstream task re-reads (staging_listing feeds the fact;
  * fact feeds 4 views — Catalyst does NOT auto-materialize shared
  * subplans, so this is the one manual optimization, SURVEY §4).
  * At cluster scale the same seam becomes a partitioned parquet write
  * (partitionBy(file_year, file_month) → partition pruning downstream).
  */
object AirbnbPipeline {

  final case class Tables(
      stagingCensus: DataFrame,
      stagingLocation: DataFrame,
      stagingListing: DataFrame,
      dimCensus: DataFrame,
      factListing: DataFrame,
      kpiNeighbourhoodMonth: DataFrame,
      kpiNeighbourhoodMonthRaw: DataFrame,
      kpiPropertyTypeMonth: DataFrame,
      kpiHostMonth: DataFrame)

  def run(spark: SparkSession, rawDir: String): Tables = {
    val stagingCensus = Staging.census(
      Ingest.rawCensusG01(spark, rawDir), Ingest.rawCensusG02(spark, rawDir))
    val stagingLocation = Staging.location(
      Ingest.rawSsc(spark, rawDir), Ingest.rawLga(spark, rawDir))
    val stagingListing = Staging.listingFromDir(spark, rawDir).cache()
    val dimCensus = Warehouse.dimCensus(stagingCensus)
    val fact = Warehouse.factListing(stagingListing, stagingLocation).cache()
    val t = Tables(
      stagingCensus = stagingCensus,
      stagingLocation = stagingLocation,
      stagingListing = stagingListing,
      dimCensus = dimCensus,
      factListing = fact,
      kpiNeighbourhoodMonth = Datamart.kpiNeighbourhoodMonth(fact, "neighbourhood_lga"),
      kpiNeighbourhoodMonthRaw = Datamart.kpiNeighbourhoodMonth(fact, "neighbourhood_cleansed"),
      kpiPropertyTypeMonth = Datamart.kpiPropertyTypeMonth(fact),
      kpiHostMonth = Datamart.kpiHostMonth(fact))
    register(t)
    t
  }

  /** Serving layer: views, like the reference datamart
    * (CREATE OR REPLACE VIEW, populate.py:507,628,747,886). */
  private def register(t: Tables): Unit = {
    t.stagingCensus.createOrReplaceTempView("staging_census")
    t.stagingLocation.createOrReplaceTempView("staging_location")
    t.stagingListing.createOrReplaceTempView("staging_listing")
    t.dimCensus.createOrReplaceTempView("dim_census")
    t.factListing.createOrReplaceTempView("fact_listing")
    t.kpiNeighbourhoodMonth.createOrReplaceTempView("kpi_neighbourhood_month")
    t.kpiNeighbourhoodMonthRaw.createOrReplaceTempView("kpi_neighbourhood_month_raw")
    t.kpiPropertyTypeMonth.createOrReplaceTempView("kpi_property_type_month")
    t.kpiHostMonth.createOrReplaceTempView("kpi_host_month")
  }
}
