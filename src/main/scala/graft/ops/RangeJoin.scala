package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) joins at scale — extension tier (the
  * reference has only equi-joins, SURVEY §2.3; range predicates are the
  * standard gap once event/metric data arrives).
  *
  * A naive `ON p >= lo AND p < hi` join has no equi-key, so Spark plans
  * it as a broadcast nested-loop join — O(|points| × |intervals|) work
  * and only viable while one side fits in a broadcast. Binning restores
  * an equi-key: every point value is assigned to a fixed-width bin, each
  * interval is replicated onto every bin it overlaps, and the join
  * becomes a plain hash-shuffled equi-join on the bin with the exact
  * range predicate re-applied as a residual filter.
  *
  * Cost model: |points| + Σ ceil(interval_width / binWidth) rows into a
  * shuffled equi-join — linear at 100 TB as long as interval widths are
  * bounded. Pick `binWidth` near the typical interval width: one-to-few
  * bins per interval, and a bin's point population bounds the per-task
  * candidate work.
  */
object RangeJoin {

  /** Inner-join `points` rows to every `intervals` row whose
    * `[loCol, hiCol)` half-open interval contains `pointCol`.
    *
    * Column names of the two inputs must be disjoint (the result carries
    * both sides' columns). Empty/inverted intervals (`hi <= lo`) match
    * nothing. NULL points or bounds never match (bin arithmetic and the
    * residual predicate are both NULL-rejecting), mirroring SQL range
    * predicates.
    */
  def binnedPointIntervalJoin(points: DataFrame, pointCol: Column,
                              intervals: DataFrame, loCol: Column, hiCol: Column,
                              binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val dup = points.columns.toSet.intersect(intervals.columns.toSet)
    require(dup.isEmpty,
      s"point/interval column names must be disjoint, both have: ${dup.mkString(", ")}")
    val bin = Names.fresh("bin", points.columns ++ intervals.columns)
    val p = points.withColumn(bin, floor(pointCol / lit(binWidth)).cast("long"))
    // an interval's last bin is floor(hi / w) even though hi is exclusive
    // (when hi sits exactly on a bin edge that bin holds no matching
    // point) — one possibly-empty bin is cheaper than an epsilon fudge
    // that would break on integer-typed bounds
    val i = intervals
      .filter(loCol < hiCol)
      .withColumn(bin, explode(sequence(
        floor(loCol / lit(binWidth)).cast("long"),
        floor(hiCol / lit(binWidth)).cast("long"))))
    p.join(i, bin)
      .filter(pointCol >= loCol && pointCol < hiCol)
      .drop(bin)
  }
}
