package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the single most recent right
  * row with the same key and `rightTs <= leftTs` — the standard
  * point-in-time lookup (last price at trade time, last snapshot before
  * an event). `direction = "forward"` mirrors it: the NEAREST right row
  * at-or-after the left timestamp (next heartbeat, next delivery). Spark has no native as-of join; the naive formulations
  * are a range join (quadratic blowup per key) or per-key
  * `mapPartitions` merges (RDD-tier, no codegen).
  *
  * This is the scalable UNION + WINDOW formulation: tag both sides,
  * union them, and take `last(payload, ignoreNulls)` over a window
  * partitioned by key and ordered by (ts, side). One shuffle on the
  * key, O(1) window state per row (running last), whole-stage codegen
  * throughout, and skew behaves exactly like any keyed window — no
  * row-pair materialization ever happens. At 100 TB this is the only
  * formulation that survives: cost is a sort of |L|+|R| rows, not
  * |L|×|R| candidate pairs.
  *
  * Semantics match `ASOF LEFT JOIN` (DuckDB) / `pandas.merge_asof`
  * (direction="backward"), which the oracle checks directly:
  *   - inclusive by default (a right row AT the left timestamp
  *     matches); `strict = true` excludes equal timestamps;
  *   - left rows with no earlier right row get NULL payload columns;
  *   - NULL-key or NULL-ts right rows never match (dropped up front);
  *     NULL-key/ts left rows pass through unmatched — SQL equality
  *     semantics, NOT Spark's NULL-grouping window semantics;
  *   - among right rows with equal (key, ts) the winner is arbitrary —
  *     pre-dedupe the right side if that matters.
  *
  * Output: all left columns plus the right side's non-key non-ts
  * columns (which must not collide with left's — rename first).
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, strict: Boolean = false,
               direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    require(payloadCols.nonEmpty, "right side has no payload columns")
    val collisions = payloadCols.intersect(left.columns.toSeq)
    require(collisions.isEmpty,
      s"right payload collides with left columns: ${collisions.mkString(", ")} — rename first")

    val payload = Names.fresh("asof_payload", left.columns ++ right.columns)
    val side = Names.fresh("asof_side", left.columns ++ right.columns)
    // inclusive: right (0) sorts before left (1) at equal ts, so the
    // running `last` at a left row has seen same-ts right rows;
    // strict: flipped, so it hasn't.
    val (rightTag, leftTag) = if (strict) (1, 0) else (0, 1)

    val rightU = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _) && col(tsCol).isNotNull)
      .select(keys.map(col) ++ Seq(col(tsCol),
        struct(payloadCols.map(col): _*).as(payload), lit(rightTag).as(side)): _*)
    val leftU = left
      .withColumn(payload, lit(null).cast(rightU.schema(payload).dataType))
      .withColumn(side, lit(leftTag))

    // forward = the mirror scan: ts DESC, so "most recent at-or-before"
    // becomes "nearest at-or-after". NULLS FIRST in both directions so a
    // NULL-ts left row scans before any (non-null-ts) right row and
    // stays unmatched — same as SQL comparison-with-NULL semantics.
    val tsOrder = if (direction == "backward") col(tsCol).asc_nulls_first
                  else col(tsCol).desc_nulls_first
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightU.unionByName(leftU, allowMissingColumns = true)
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
      .filter(col(side) === leftTag)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col(payload).getField(c).as(c)): _*)
  }
}
