package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Geo

/** Geospatial registry entries ([[graft.ops.Geo]]): grid-blocked
  * nearest-neighbour join, box-smoothed density, and trajectory length.
  * The reference carries latitude/longitude on every listing
  * (design.sql:217–218) but never computes on them — this is the tier
  * a listings corpus grows into. Coordinates are derived
  * deterministically from keys (the testdata has no geo columns; same
  * shim discipline as the media tables), and every compared value is an
  * exact integer (whole meters / counts), so the DuckDB oracle replays
  * the trig bit-safely — see the exactness contract in [[Geo]].
  */
object GeoQueries {

  // suppliers get a different key mix than customers so co-numbered
  // rows don't coincide geographically
  private def suppPointId = col("s_suppkey") * 131L + 17L
  private val suppPointIdSql = "(s_suppkey * 131 + 17)"

  /** 3 nearest suppliers per customer, grid-blocked haversine kNN
    * ([[Geo.gridKnnJoin]]): candidates come from ONE equi-join on grid
    * cells (supplier side replicated ×9 into its cell neighbourhood —
    * the bounded/static index side), ranked by (meters, suppkey) via
    * the partial-aggregable bounded top-k aggregate. The cell size is
    * DENSITY-ADAPTIVE ([[Geo.adaptiveCellDeg]] from one count of the
    * index side): per-customer candidate work stays ~9·8 at every SF,
    * so the whole join is scan-linear at 100× where a fixed cell would
    * go quadratic as both sides densify. The oracle recomputes the
    * identical cell from the same COUNT(*) and replays the blocking,
    * meter quantization, and tie order. */
  private val x_geo_grid_knn = Q(
    "x_geo_grid_knn",
    (s, d) => {
      val cell = Geo.adaptiveCellDeg(Tables.supplier(s, d).count())
      val cust = Tables.customer(s, d).select(
        col("c_custkey"),
        Geo.synthLat(col("c_custkey")).as("lat"),
        Geo.synthLon(col("c_custkey")).as("lon"))
      val supp = Tables.supplier(s, d).select(
        col("s_suppkey"),
        Geo.synthLat(suppPointId).as("lat"),
        Geo.synthLon(suppPointId).as("lon"))
      Geo.gridKnnJoin(cust, "c_custkey", supp, "s_suppkey",
        cellDeg = cell, k = 3)
    },
    Some(s"""WITH c AS (
        SELECT ${Geo.adaptiveCellDegSql("COUNT(*)")} AS cell FROM supplier),
      l AS (
        SELECT c_custkey,
          ${Geo.synthLatSql("c_custkey")} AS lat,
          ${Geo.synthLonSql("c_custkey")} AS lon
        FROM customer),
      r AS (
        SELECT s_suppkey,
          ${Geo.synthLatSql(suppPointIdSql)} AS r_lat,
          ${Geo.synthLonSql(suppPointIdSql)} AS r_lon
        FROM supplier),
      r9 AS (
        SELECT s_suppkey, r_lat, r_lon,
          CAST(FLOOR(r_lat / c.cell) AS BIGINT) + dy.dy AS cell_y,
          CAST(FLOOR(r_lon / c.cell) AS BIGINT) + dx.dx AS cell_x
        FROM r, c,
          (SELECT unnest([-1, 0, 1]) AS dy) dy,
          (SELECT unnest([-1, 0, 1]) AS dx) dx),
      cand AS (
        SELECT l.c_custkey, r9.s_suppkey,
          ${Geo.haversineMSql("l.lat", "l.lon", "r9.r_lat", "r9.r_lon")} AS dist_m
        FROM l CROSS JOIN c JOIN r9
          ON CAST(FLOOR(l.lat / c.cell) AS BIGINT) = r9.cell_y
         AND CAST(FLOOR(l.lon / c.cell) AS BIGINT) = r9.cell_x)
      SELECT c_custkey, s_suppkey, dist_m,
        CAST(ROW_NUMBER() OVER (
          PARTITION BY c_custkey ORDER BY dist_m, s_suppkey) AS INTEGER) AS rank
      FROM cand
      QUALIFY rank <= 3"""))

  /** Half-degree-grid customer density with 3×3 box smoothing
    * ([[Geo.gridDensity]]): one combinable groupBy over the corpus,
    * then the smoothing explode runs over OCCUPIED CELLS (grid-bounded,
    * not corpus-bounded). Pure integer counts. */
  private val x_geo_grid_density = Q(
    "x_geo_grid_density",
    (s, d) => {
      val cust = Tables.customer(s, d)
      Geo.gridDensity(cust,
        Geo.synthLat(col("c_custkey")), Geo.synthLon(col("c_custkey")),
        cellDeg = 0.5)
    },
    Some(s"""WITH p AS (
        SELECT
          CAST(FLOOR(${Geo.synthLatSql("c_custkey")} / 0.5) AS BIGINT) AS cell_y,
          CAST(FLOOR(${Geo.synthLonSql("c_custkey")} / 0.5) AS BIGINT) AS cell_x
        FROM customer),
      per AS (
        SELECT cell_y, cell_x, COUNT(*) AS n_points
        FROM p GROUP BY 1, 2),
      sm AS (
        SELECT per.cell_y + dy.dy AS cell_y, per.cell_x + dx.dx AS cell_x,
          CAST(SUM(n_points) AS BIGINT) AS n_smoothed
        FROM per,
          (SELECT unnest([-1, 0, 1]) AS dy) dy,
          (SELECT unnest([-1, 0, 1]) AS dx) dx
        GROUP BY 1, 2)
      SELECT sm.cell_y, sm.cell_x,
        COALESCE(per.n_points, 0) AS n_points, sm.n_smoothed
      FROM sm LEFT JOIN per
        ON sm.cell_y = per.cell_y AND sm.cell_x = per.cell_x"""))

  /** Per-user trajectory length ([[Geo.pathLength]]): each user's
    * events ordered by (ts, event_id) form a synthetic GPS trace; legs
    * are consecutive-pair haversines as exact meter integers, summed
    * per user — one window + one groupBy sharing a single shuffle on
    * user_id. */
  private val x_geo_path_length = Q(
    "x_geo_path_length",
    (s, d) => {
      val pts = Tables.events(s, d).select(
        col("user_id"), col("ts"), col("event_id"),
        Geo.synthLat(col("event_id")).as("lat"),
        Geo.synthLon(col("event_id")).as("lon"))
      Geo.pathLength(pts, "user_id", col("lat"), col("lon"),
        Seq(col("ts"), col("event_id")))
    },
    Some(s"""WITH p AS (
        SELECT user_id, ts, event_id,
          ${Geo.synthLatSql("event_id")} AS lat,
          ${Geo.synthLonSql("event_id")} AS lon
        FROM events),
      legs AS (
        SELECT user_id,
          LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon, lat, lon
        FROM p
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id,
        CAST(COUNT(*) - 1 AS BIGINT) AS n_legs,
        CAST(SUM(CASE WHEN plat IS NOT NULL
          THEN ${Geo.haversineMSql("plat", "plon", "lat", "lon")}
          ELSE 0 END) AS BIGINT) AS path_m
      FROM legs
      GROUP BY user_id"""))

  val all: Seq[Q] = Seq(x_geo_grid_knn, x_geo_grid_density, x_geo_path_length)
}
