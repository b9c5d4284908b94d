package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) snapshot merge.
  *
  * The reference's warehouse is snapshot-SCD by construction: one
  * fact row per (id, filename-month), full history retained, no row
  * ever closed (workfile_design_data_warehouse.sql:3 "be careful of
  * SCDs"; PK design.sql:413; snapshot-validity filter design.sql:543).
  * That layout re-stores every attribute every month — at 100 TB the
  * history table is 12× the entity count per year even when nothing
  * changed. The classic Type-2 ledger stores one row per VERSION
  * (valid_from / valid_to / is_current) and is the form warehouse
  * migrations ask for first, so the engine provides the merge as an
  * operator.
  *
  * Semantics of one merge step, given the current ledger and a full
  * snapshot taken at `asOf`:
  *   - unchanged entity  → current row untouched
  *   - changed entity    → current row closed (valid_to = asOf) + a new
  *                         current row (valid_from = asOf)
  *   - new entity        → new current row
  *   - absent entity     → current row closed (soft delete)
  * Closed (historical) rows pass through untouched. Change detection
  * compares the tracked attribute columns value-by-value, null-safe.
  *
  * Scale shape: one full-outer shuffle join of the CURRENT slice
  * against the snapshot on the entity key — history rows are routed
  * around the join with a cheap filter-union, so the join input is
  * |entities|, not |versions|. No window, no sort, no driver collect.
  */
object Snapshot {

  /** Column layout of the ledger: entity key cols + tracked attribute
    * cols + (valid_from: DATE, valid_to: DATE nullable, is_current). */
  def scd2Merge(
      ledger: DataFrame,
      snapshot: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String],
      asOf: Column): DataFrame = {
    val closed = ledger.filter(!col("is_current"))
    val current = ledger.filter(col("is_current"))

    val cur = current.alias("cur")
    val snp = snapshot.alias("snp")
    val joined = cur.join(
      snp, keyCols.map(k => cur(k) === snp(k)).reduce(_ && _), "full_outer")

    val inCur = keyCols.map(cur(_).isNotNull).reduce(_ && _)
    val inSnp = keyCols.map(snp(_).isNotNull).reduce(_ && _)
    // null-safe per-column equality; <=> treats NULL==NULL as true
    val same = attrCols.map(c => cur(c) <=> snp(c)).reduce(_ && _)

    // Each joined row emits its output role(s) as an exploded struct
    // array — a filter-per-role union would instead make Catalyst
    // specialize the join THREE times (observed: inner + left-outer +
    // right-outer branches, each rescanning both inputs), tripling the
    // snapshot computation at scale. This form keeps exactly one
    // full-outer join and one generate pass.
    def row(side: String => Column, from: Column, to: Column, isCur: Column) =
      struct(keyCols.map(k => side(k).as(k)) ++
        attrCols.map(a => side(a).as(a)) ++ Seq(
          from.as("valid_from"), to.as("valid_to"), isCur.as("is_current")): _*)
    val nullDate = lit(null).cast("date")
    val keepRow = row(cur(_), cur("valid_from"), nullDate, lit(true))
    val closeRow = row(cur(_), cur("valid_from"), asOf, lit(false))
    val openRow = row(snp(_), asOf, nullDate, lit(true))
    val emitted =
      when(inCur && inSnp && same, array(keepRow))
        .when(inCur && inSnp && !same, array(closeRow, openRow))
        .when(inCur && !inSnp, array(closeRow)) // soft delete
        .otherwise(array(openRow))              // brand new
    val merged = joined.select(explode(emitted).as("r")).select(col("r.*"))

    closed.unionByName(merged)
  }

  /** Bootstrap a ledger from the first snapshot. */
  def scd2Init(snapshot: DataFrame, asOf: Column): DataFrame =
    snapshot
      .withColumn("valid_from", asOf)
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
}
