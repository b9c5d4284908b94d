package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Geospatial operators at scale — extension tier. The reference's
  * listings carry latitude/longitude columns that its SQL never
  * computes on (design.sql:217–218 casts them and stops there); this
  * module supplies the operations a listings/geo corpus actually
  * needs — distance, nearest-neighbour join, density — with the same
  * scale discipline as the similarity tier: every join is an
  * equi-join on a grid cell, never a distance cross join.
  *
  * Exactness contract (the house oracle discipline): all COMPARED
  * values are integers. Haversine is quantized to whole meters
  * (`CAST(ROUND(km·10^6)/1000 ...)` ≡ micro-km → m) before any
  * ranking or summing, so the ≤2-ulp libm differences between the
  * JVM and DuckDB trig implementations — absolute error ~10^-12 km
  * on earth-scale distances — sit eight decades below the 0.5 m
  * rounding boundary and can never flip a compared value. Sums of
  * distances are sums of exact meter integers: associative,
  * order-independent, replayable.
  */
object Geo {

  /** IUGG mean earth radius, km. */
  val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km between two WGS84 points, classic
    * haversine. Written with explicit `s*s` squares (not `pow`) and a
    * fixed association order so the oracle SQL can mirror the exact
    * double-op sequence; see [[haversineKmSql]]. */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    val sLat = sin(radians(lat2 - lat1) / 2)
    val sLon = sin(radians(lon2 - lon1) / 2)
    val h = sLat * sLat + cos(radians(lat1)) * cos(radians(lat2)) * (sLon * sLon)
    lit(2 * EarthRadiusKm) * asin(sqrt(h))
  }

  /** Same computation as [[haversineKm]] in DuckDB SQL over the given
    * column expressions. */
  def haversineKmSql(lat1: String, lon1: String,
                     lat2: String, lon2: String): String =
    s"""(2 * $EarthRadiusKm) * asin(sqrt(
        sin(radians($lat2 - $lat1) / 2) * sin(radians($lat2 - $lat1) / 2)
        + cos(radians($lat1)) * cos(radians($lat2))
          * (sin(radians($lon2 - $lon1) / 2) * sin(radians($lon2 - $lon1) / 2))))"""

  /** Haversine quantized to whole meters (BIGINT) — the comparable,
    * exactly-summable form every registered geo query ranks on. */
  def haversineM(lat1: Column, lon1: Column,
                 lat2: Column, lon2: Column): Column =
    round(haversineKm(lat1, lon1, lat2, lon2) * 1000).cast("long")

  def haversineMSql(lat1: String, lon1: String,
                    lat2: String, lon2: String): String =
    s"CAST(ROUND((${haversineKmSql(lat1, lon1, lat2, lon2)}) * 1000) AS BIGINT)"

  // ---------------------------------------------------------------------
  // Synthetic deterministic coordinates. The TPC-H-shaped testdata has no
  // geo columns, so registered queries derive a point from a key with
  // integer LCG-style mixing — exact in both engines (all intermediates
  // < 2^53) — spread over a NSW-like bounding box (the reference's
  // corpus is Sydney listings). Production replaces these with real
  // lat/lon columns; every operator below takes plain Columns.
  // ---------------------------------------------------------------------

  def synthLat(id: Column): Column =
    lit(-37.5) + (id * 48271L % 100003L).cast("double") / 100003.0 * 9.0

  def synthLon(id: Column): Column =
    lit(141.0) + (id * 69621L % 99991L).cast("double") / 99991.0 * 12.0

  def synthLatSql(id: String): String =
    s"(-37.5 + (($id * 48271) % 100003) / 100003.0 * 9.0)"

  def synthLonSql(id: String): String =
    s"(141.0 + (($id * 69621) % 99991) / 99991.0 * 12.0)"

  /** Density-adaptive cell size: pick the cell so the expected index-
    * side population per cell stays ~`perCell` REGARDLESS of corpus
    * size — cells per axis grow as √n, so [[gridKnnJoin]] candidate
    * work stays |left|·9·perCell = scan-linear at any density (a FIXED
    * cell degrades quadratically as both sides densify: the
    * x_kmeans_step lesson applied to space). Every op is IEEE-exact
    * (sqrt is correctly rounded, unlike the libm trig) so the oracle
    * recomputes the identical double from the same count. */
  def adaptiveCellDeg(nIndexSide: Long, spanDeg: Double = 9.0,
                      perCell: Double = 8.0): Double =
    spanDeg / math.max(1.0, math.floor(math.sqrt(nIndexSide / perCell)))

  /** SQL twin of [[adaptiveCellDeg]] over `COUNT(*)` of the index-side
    * relation (embed inside a 1-row CTE). */
  def adaptiveCellDegSql(countExpr: String, spanDeg: Double = 9.0,
                         perCell: Double = 8.0): String =
    s"($spanDeg / GREATEST(1.0, FLOOR(SQRT($countExpr / $perCell))))"

  // ---------------------------------------------------------------------
  // Grid-blocked nearest-neighbour join
  // ---------------------------------------------------------------------

  /** k nearest `right` points for every `left` point, grid-blocked.
    *
    * Both inputs carry (`idCol`, `lat`, `lon`). Each side is keyed by
    * its `cellDeg`-degree grid cell; the RIGHT side (pass the smaller /
    * static corpus — the index side) is replicated into its 3×3 cell
    * neighbourhood, and candidates come from one hash equi-join on
    * (cellY, cellX) — never a distance cross join. Per-left candidate
    * work is bounded by 9 · (right density per cell); total work is
    * |left| + 9·|right| + |candidates|, scan-linear at fixed density.
    *
    * Candidates within a cell radius are EXACT: any right point within
    * `cellDeg` degrees of latitude/longitude sits in the 3×3
    * neighbourhood, so with cellDeg chosen ≥ the expected kth-neighbour
    * radius the blocked result equals true kNN; the registered query's
    * oracle replays the same blocking, making the algorithm itself the
    * proven object (the recall-vs-cell-size tradeoff is measured in
    * GeoSpec against the unblocked ground truth).
    *
    * Ranking is by (meters, right id) — a total order on exact
    * integers — reduced by the partial-aggregable bounded top-k
    * aggregate ([[GraftFunctions.topKBy]]): each map task ships at most
    * k candidates per left id into the final shuffle, not the whole
    * candidate set (the window formulation would).
    *
    * Output: (leftId, rightId, dist_m, rank), rank 1..k.
    */
  def gridKnnJoin(left: DataFrame, leftId: String,
                  right: DataFrame, rightId: String,
                  cellDeg: Double, k: Int): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    require(cellDeg > 0, s"need cellDeg > 0, got $cellDeg")
    val l = left.select(
      col(leftId), col("lat"), col("lon"),
      floor(col("lat") / cellDeg).cast("long").as("cell_y"),
      floor(col("lon") / cellDeg).cast("long").as("cell_x"))
    val offsets = array((-1 to 1).map(o => lit(o.toLong)): _*)
    val r = right.select(
      col(rightId), col("lat").as("r_lat"), col("lon").as("r_lon"))
      .withColumn("dy", explode(offsets))
      .withColumn("dx", explode(offsets))
      .select(col(rightId), col("r_lat"), col("r_lon"),
        (floor(col("r_lat") / cellDeg).cast("long") + col("dy")).as("cell_y"),
        (floor(col("r_lon") / cellDeg).cast("long") + col("dx")).as("cell_x"))
    val cand = l.join(r, Seq("cell_y", "cell_x"))
      .withColumn("dist_m",
        haversineM(col("lat"), col("lon"), col("r_lat"), col("r_lon")))
    // score = -meters: top-k highest score = k smallest distances; the
    // aggregate's tie rule (keep smaller key) matches ORDER BY dist, id
    cand.groupBy(col(leftId))
      .agg(GraftFunctions.topKBy(
        -col("dist_m").cast("double"), col(rightId), k).as("nn"))
      .select(col(leftId), posexplode(col("nn")).as(Seq("pos", "nn")))
      .select(col(leftId),
        col("nn.key").as(rightId),
        (-col("nn.score")).cast("long").as("dist_m"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  // ---------------------------------------------------------------------
  // Grid density with 3×3 box smoothing
  // ---------------------------------------------------------------------

  /** Per-cell point count plus the 3×3 neighbourhood-smoothed count.
    *
    * Pass 1 is one combinable groupBy over the points; pass 2 explodes
    * each CELL AGGREGATE (not each point) into its 9 neighbour cells
    * and re-aggregates — the expensive corpus touch is a single
    * map-side-combined shuffle, and the smoothing costs 9× the number
    * of OCCUPIED CELLS, which is bounded by the grid, not the corpus.
    *
    * Output: (cell_y, cell_x, n_points, n_smoothed) — n_smoothed sums
    * the cell and its 8 neighbours; cells with zero points of their own
    * appear whenever a neighbour is occupied (ring cells), matching the
    * oracle's replay. */
  def gridDensity(points: DataFrame, lat: Column, lon: Column,
                  cellDeg: Double): DataFrame = {
    require(cellDeg > 0, s"need cellDeg > 0, got $cellDeg")
    val perCell = points.select(
      floor(lat / cellDeg).cast("long").as("cell_y"),
      floor(lon / cellDeg).cast("long").as("cell_x"))
      .groupBy("cell_y", "cell_x")
      .agg(count(lit(1)).as("n_points"))
    val offsets = array((-1 to 1).map(o => lit(o.toLong)): _*)
    val spread = perCell
      .withColumn("dy", explode(offsets))
      .withColumn("dx", explode(offsets))
      .select((col("cell_y") + col("dy")).as("cell_y"),
        (col("cell_x") + col("dx")).as("cell_x"),
        col("n_points"))
      .groupBy("cell_y", "cell_x")
      .agg(sum(col("n_points")).as("n_smoothed"))
    spread.join(perCell, Seq("cell_y", "cell_x"), "left")
      .select(col("cell_y"), col("cell_x"),
        coalesce(col("n_points"), lit(0L)).as("n_points"),
        col("n_smoothed"))
  }

  // ---------------------------------------------------------------------
  // Trajectory length
  // ---------------------------------------------------------------------

  /** Total trajectory length per group: order each group's points by
    * `orderCols`, take consecutive-pair haversines, sum them as exact
    * meter integers. One window shuffle on the group key (the same
    * shuffle the subsequent groupBy reuses — Catalyst plans a single
    * Exchange), legs = points − 1 per group.
    *
    * Output: (groupCol, n_legs, path_m). Single-point groups yield
    * n_legs = 0, path_m = 0. */
  def pathLength(points: DataFrame, groupCol: String,
                 lat: Column, lon: Column, orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
    points
      .withColumn("__plat", lag(lat, 1).over(w))
      .withColumn("__plon", lag(lon, 1).over(w))
      .withColumn("__leg_m",
        when(col("__plat").isNotNull,
          haversineM(col("__plat"), col("__plon"), lat, lon))
          .otherwise(lit(0L)))
      .groupBy(col(groupCol))
      .agg((count(lit(1)) - 1).as("n_legs"),
        sum(col("__leg_m")).as("path_m"))
  }
}
