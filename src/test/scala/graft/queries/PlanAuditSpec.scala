package graft.queries

import org.apache.spark.sql.execution.SparkPlan

import graft.SparkSpec

/** Physical-plan audits for the query suite — the properties that decide
  * whether a plan survives a 100× scale-up, asserted so they cannot
  * silently regress:
  *
  *   - filters reach the parquet scan (PushedFilters), so row groups are
  *     skipped at the source instead of decoded and discarded;
  *   - column pruning reaches the scan (ReadSchema), so a 2-column query
  *     over a 9-column table reads 2 columns;
  *   - bounded dimensions join via broadcast hash join, not a shuffle of
  *     the fact side;
  *   - NO query in the registry executes a CartesianProduct — the only
  *     intentional unkeyed joins are broadcast nested loops against
  *     bounded (1-row aggregate / query-batch / centroid) sides.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): SparkPlan =
    Registry.queries(name)(spark, sf001).queryExecution.executedPlan

  private def planStr(name: String): String = plan(name).toString

  test("q_a1: the date filter is pushed down to the lineitem parquet scan") {
    val p = planStr("q_a1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"date filter not pushed to scan:\n$p")
  }

  test("q_a10: scan reads ONLY the two projected columns of orders") {
    val p = planStr("q_a10_distinct")
    val read = "ReadSchema: struct<o_orderstatus:string,o_orderpriority:string>"
    assert(p.contains(read), s"column pruning failed:\n$p")
  }

  test("flagship joins the bounded nation dim via broadcast, not shuffle") {
    val p = planStr("q_kpi_nation_month")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
  }

  test("no query in the registry executes a CartesianProduct") {
    Registry.queries.keys.toSeq.sorted.foreach { name =>
      val p = planStr(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$p")
    }
  }
}
