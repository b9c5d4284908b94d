package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("haversineKm: Sydney-Melbourne great-circle is ~713 km") {
    val km = Seq((-33.8688, 151.2093, -37.8136, 144.9631))
      .toDF("lat1", "lon1", "lat2", "lon2")
      .select(Geo.haversineKm(
        col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("km"))
      .head().getDouble(0)
    assert(km > 700 && km < 725, s"got $km")
  }

  test("haversineKm is symmetric and zero on identical points") {
    val r = Seq((-30.0, 145.0, -35.5, 150.5))
      .toDF("lat1", "lon1", "lat2", "lon2")
      .select(
        Geo.haversineM(col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("ab"),
        Geo.haversineM(col("lat2"), col("lon2"), col("lat1"), col("lon1")).as("ba"),
        Geo.haversineM(col("lat1"), col("lon1"), col("lat1"), col("lon1")).as("aa"))
      .head()
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(2) == 0L)
  }

  test("gridKnnJoin equals unblocked kNN when every neighbour is within one cell") {
    // points spread over ~2 degrees; cellDeg = 5 guarantees the 3x3
    // neighbourhood contains the whole corpus -> blocked == exact kNN
    val left = (1L to 40L).map(i =>
      (i, -32.0 + (i % 7) * 0.3, 150.0 + (i % 5) * 0.4))
      .toDF("lid", "lat", "lon")
    val right = (1L to 25L).map(j =>
      (j, -31.8 + (j % 6) * 0.35, 150.1 + (j % 4) * 0.5))
      .toDF("rid", "lat", "lon")
    val blocked = Geo.gridKnnJoin(left, "lid", right, "rid", cellDeg = 5.0, k = 2)
      .select("lid", "rid", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val l = left.select(col("lid"), col("lat").as("llat"), col("lon").as("llon"))
    val exact = l.crossJoin(right)
      .withColumn("dist_m",
        Geo.haversineM(col("llat"), col("llon"), col("lat"), col("lon")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("lid")).orderBy(col("dist_m"), col("rid"))))
      .filter(col("rank") <= 2)
      .select("lid", "rid", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    assert(blocked == exact)
  }

  test("gridKnnJoin: a candidate-starved cell yields fewer than k neighbours, never wrong ones") {
    val left = Seq((1L, 0.0, 0.0), (2L, 50.0, 50.0)).toDF("lid", "lat", "lon")
    // only one right point near left#1; nothing within a cell of left#2
    val right = Seq((10L, 0.4, 0.4), (20L, 20.0, 20.0)).toDF("rid", "lat", "lon")
    val out = Geo.gridKnnJoin(left, "lid", right, "rid", cellDeg = 1.0, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L)))
  }

  test("gridDensity: smoothed count equals the brute-force 3x3 box sum") {
    val pts = (1L to 200L).map(i =>
      (i, -33.0 + (i % 11) * 0.17, 150.0 + (i % 13) * 0.23))
      .toDF("id", "lat", "lon")
    val cell = 0.25
    val got = Geo.gridDensity(pts, col("lat"), col("lon"), cell)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val raw = pts.select(
      floor(col("lat") / cell).cast("long").as("cy"),
      floor(col("lon") / cell).cast("long").as("cx"))
      .groupBy("cy", "cx").count()
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.nonEmpty)
    got.foreach { case ((cy, cx), (n, sm)) =>
      assert(n == raw.getOrElse((cy, cx), 0L))
      val box = (for { dy <- -1 to 1; dx <- -1 to 1 }
        yield raw.getOrElse((cy + dy, cx + dx), 0L)).sum
      assert(sm == box, s"cell ($cy,$cx)")
    }
    // every occupied cell is present
    raw.keys.foreach(k => assert(got.contains(k)))
  }

  test("pathLength: known two-leg path sums exactly; single point is zero") {
    val pts = Seq(
      (1L, 1, -33.0, 151.0), (1L, 2, -33.0, 152.0), (1L, 3, -34.0, 152.0),
      (2L, 1, -30.0, 145.0))
      .toDF("uid", "seq", "lat", "lon")
    val legs = Seq(
      (-33.0, 151.0, -33.0, 152.0), (-33.0, 152.0, -34.0, 152.0))
      .toDF("a", "b", "c", "d")
      .select(Geo.haversineM(col("a"), col("b"), col("c"), col("d")).as("m"))
      .collect().map(_.getLong(0)).sum
    val out = Geo.pathLength(pts, "uid", col("lat"), col("lon"), Seq(col("seq")))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((2L, legs)))
    assert(out(2L) == ((0L, 0L)))
  }

  test("synth coordinates stay inside the declared bounding box") {
    val r = spark.range(1, 5000)
      .select(Geo.synthLat(col("id")).as("lat"), Geo.synthLon(col("id")).as("lon"))
      .agg(min("lat"), max("lat"), min("lon"), max("lon")).head()
    assert(r.getDouble(0) >= -37.5 && r.getDouble(1) < -28.5)
    assert(r.getDouble(2) >= 141.0 && r.getDouble(3) < 153.0)
  }
}
