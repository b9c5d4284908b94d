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

  /** DBSCAN point classification (core / border / noise) over the
    * customer point cloud — the density-clustering kernel (Ester et
    * al. 1996) reduced to its two neighbor-counting passes:
    * core = ≥ minPts neighbors (self included) within ε, border =
    * non-core with ≥ 1 CORE neighbor within ε, noise = the rest.
    * Distances are squared-degree Euclidean (no trig — every compare
    * is an identical +,−,× tree both engines).
    *
    * Scale shape: ε doubles as the grid cell, and — the geo-kNN
    * lesson — ε is DENSITY-ADAPTIVE (∝ 1/√n via
    * [[Geo.adaptiveCellDeg]]), so expected per-cell population is
    * constant and each of the two 3×3-cell candidate joins stays
    * scan-linear at any corpus size; a FIXED ε would densify every
    * neighborhood linearly and the join quadratically. With ~8 points
    * per cell the ε-circle holds ~π·8 ≈ 25 neighbors in expectation,
    * so minPts = 18 sits just above the measured mean (17.6) and splits
    * the cloud into a real core/border/noise mix (minPts = 8 labeled
    * 99.9% core; 24 labeled everything noise). Emits the 3-row label
    * summary with exact mean-neighbor milli. */
  private val x_geo_dbscan_core = Q(
    "x_geo_dbscan_core",
    (s, d) => {
      val minPts = 18
      val eps = Geo.adaptiveCellDeg(Tables.customer(s, d).count())
      val pts = Tables.customer(s, d).select(col("c_custkey").as("id"),
        Geo.synthLat(col("c_custkey")).as("lat"),
        Geo.synthLon(col("c_custkey")).as("lon"))
        .withColumn("cx", floor(col("lon") / eps).cast("long"))
        .withColumn("cy", floor(col("lat") / eps).cast("long"))
        .localCheckpoint(true) // consumed by both candidate joins
      def repl9(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("dx", explode(sequence(lit(-1), lit(1))))
        .withColumn("dy", explode(sequence(lit(-1), lit(1))))
        .select((col("cx") + col("dx")).as("cx"),
          (col("cy") + col("dy")).as("cy"),
          col("id").as("rid"), col("lat").as("rlat"), col("lon").as("rlon"))
      def near: org.apache.spark.sql.Column = {
        val dLat = col("lat") - col("rlat")
        val dLon = col("lon") - col("rlon")
        dLat * dLat + dLon * dLon <= lit(eps * eps)
      }
      val counts = pts.join(repl9(pts), Seq("cx", "cy"))
        .filter(near)
        .groupBy(col("id"), col("lat"), col("lon"), col("cx"), col("cy"))
        .agg(count(lit(1)).as("n_neigh"))
      val coreFlagged = counts
        .withColumn("is_core", col("n_neigh") >= minPts)
        .localCheckpoint(true) // consumed by border join + final rollup
      val coreSide = repl9(coreFlagged.filter(col("is_core")))
      val border = coreFlagged.filter(!col("is_core"))
        .join(coreSide, Seq("cx", "cy"))
        .filter(near && col("rid") =!= col("id"))
        .select(col("id")).distinct()
      val labeled = coreFlagged.join(border.withColumn("b", lit(true)),
          Seq("id"), "left")
        .withColumn("label", when(col("is_core"), "core")
          .when(col("b"), "border").otherwise("noise"))
      labeled.groupBy(col("label"))
        .agg(count(lit(1)).as("n_points"),
          expr("SUM(n_neigh) * 1000 DIV COUNT(*)").as("mean_neigh_milli"))
    },
    Some {
      val eps = Geo.adaptiveCellDegSql("(SELECT COUNT(*) FROM customer)")
      s"""WITH ep AS (SELECT $eps AS eps),
      pts AS (
        SELECT c_custkey AS id,
          ${Geo.synthLatSql("c_custkey")} AS lat,
          ${Geo.synthLonSql("c_custkey")} AS lon,
          CAST(FLOOR(${Geo.synthLonSql("c_custkey")} / eps) AS BIGINT) AS cx,
          CAST(FLOOR(${Geo.synthLatSql("c_custkey")} / eps) AS BIGINT) AS cy
        FROM customer CROSS JOIN ep),
      r9 AS (
        SELECT cx + dx.x AS cx, cy + dy.y AS cy,
          id AS rid, lat AS rlat, lon AS rlon
        FROM pts,
          (SELECT unnest([-1, 0, 1]) AS x) dx,
          (SELECT unnest([-1, 0, 1]) AS y) dy),
      counts AS (
        SELECT p.id, p.lat, p.lon, p.cx, p.cy,
          CAST(COUNT(*) AS BIGINT) AS n_neigh
        FROM pts p JOIN r9 USING (cx, cy) CROSS JOIN ep
        WHERE (p.lat - r9.rlat) * (p.lat - r9.rlat)
            + (p.lon - r9.rlon) * (p.lon - r9.rlon) <= eps * eps
        GROUP BY 1, 2, 3, 4, 5),
      flagged AS (SELECT *, n_neigh >= 18 AS is_core FROM counts),
      core9 AS (
        SELECT cx + dx.x AS cx, cy + dy.y AS cy,
          id AS rid, lat AS rlat, lon AS rlon
        FROM flagged,
          (SELECT unnest([-1, 0, 1]) AS x) dx,
          (SELECT unnest([-1, 0, 1]) AS y) dy
        WHERE is_core),
      border AS (
        SELECT DISTINCT f.id
        FROM flagged f JOIN core9 USING (cx, cy) CROSS JOIN ep
        WHERE NOT f.is_core AND core9.rid <> f.id
          AND (f.lat - core9.rlat) * (f.lat - core9.rlat)
            + (f.lon - core9.rlon) * (f.lon - core9.rlon) <= eps * eps),
      labeled AS (
        SELECT f.id, f.n_neigh,
          CASE WHEN f.is_core THEN 'core'
               WHEN b.id IS NOT NULL THEN 'border'
               ELSE 'noise' END AS label
        FROM flagged f LEFT JOIN border b ON f.id = b.id)
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_points,
        CAST(SUM(n_neigh) * 1000 // COUNT(*) AS BIGINT) AS mean_neigh_milli
      FROM labeled GROUP BY 1"""
    })

  val all: Seq[Q] = Seq(x_geo_grid_knn, x_geo_grid_density,
    x_geo_path_length, x_geo_dbscan_core)
}
