package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KPI-layer aggregate builders mirroring the reference datamart views
  * (workfile_populate_data_warehouse.py:507–925).
  */
object Kpis {

  /** Month-over-month percentage change of a metric via LAG over a
    * grouped series — workfile_populate_data_warehouse.py:569–570.
    * "Previous row", not "previous calendar month": gaps are NOT filled,
    * matching the reference exactly (SURVEY §7.5.3).
    *
    * Inputs must already be one row per (partCols, orderCols) — i.e. an
    * aggregated series — so the window shuffle is on the small
    * aggregated data, not the fact table.
    */
  def lagPctChange(df: DataFrame, partCols: Seq[String], orderCols: Seq[String],
                   metric: String, as: String): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val prev = lag(col(metric), 1).over(w)
    // (cur - prev) / prev * 100 in double, identical expression shape to
    // the oracle SQL so the FP result is bit-identical.
    df.withColumn(as,
      (col(metric).cast("double") - prev.cast("double")) / prev.cast("double") * lit(100.0))
  }

  /** The reference's self-join-of-aggregates pattern (J5): N independently
    * filtered+grouped aggregates of the same fact, FULL OUTER joined back
    * together on the grouping keys (workfile_populate_data_warehouse.py:552–619).
    *
    * `USING`-style join so the key columns coalesce across sides. At scale
    * each aggregate is small relative to the fact; Spark shuffles each
    * aggregate once on the keys and AQE picks SMJ/shuffled-hash (broadcast
    * is unavailable for full-outer).
    */
  def fullOuterOfAggs(keys: Seq[String], aggs: Seq[DataFrame]): DataFrame =
    aggs.reduce((a, b) => a.join(b, keys, "full_outer"))

  /** One-pass conditional-aggregation rewrite of the reference's repeated
    * scalar-subquery scans (workfile_ad-hoc_analysis.sql:183–187):
    * 5 x (SELECT COUNT(*) FROM cte WHERE pred) becomes a single scan with
    * sum(when(pred,1)). Oracle-equivalent, one shuffle instead of five. */
  def conditionalCounts(df: DataFrame, preds: Map[String, Column]): DataFrame = {
    val cols = preds.toSeq.sortBy(_._1).map { case (name, p) =>
      sum(when(p, 1L).otherwise(0L)).as(name)
    }
    df.agg(cols.head, cols.tail: _*)
  }
}
