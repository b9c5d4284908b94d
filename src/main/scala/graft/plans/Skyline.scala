package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, SinglePartition}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Skyline (Pareto frontier) as a CUSTOM WHOLE OPERATOR — tier (c) of
  * the extension ladder (SURVEY §7.3): a logical plan node, a planner
  * strategy, and a physical operator, because no composition of
  * built-in operators expresses skyline without an O(n²) self-join.
  *
  * A row survives iff no other row is ≥ on every dimension and > on at
  * least one (all dimensions MAXIMIZED; negate a column to minimize).
  * The multi-criteria "best tradeoffs" query — price-vs-quality corpus
  * picks, cost-vs-coverage source selection — that a NOT EXISTS
  * formulation computes by comparing every pair.
  *
  * Physical plan: LOCAL skyline per partition (the skyline operator is
  * idempotent and distributive: skyline(A ∪ B) = skyline(skyline(A) ∪
  * skyline(B)), so partition-local pruning is lossless), then the
  * surviving candidates — for random data an O(log^{d-1} n)-sized set,
  * not O(n) — gather to one task for the final pass. The corpus-sized
  * pass never shuffles; only frontier candidates move. Each local pass
  * sorts by the first dimension descending so a candidate is only ever
  * compared against rows that can actually dominate it.
  */
case class SkylinePlan(dims: Seq[Expression], child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): SkylinePlan =
    copy(child = newChild)
}

object SkylineStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SkylinePlan(dims, child) =>
      SkylineExec(dims, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class SkylineExec(dims: Seq[Expression], child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = SinglePartition

  override protected def doExecute(): RDD[InternalRow] = {
    val bound = dims.map(BindReferences.bindReference(_, child.output))
    bound.foreach { e =>
      e.dataType match {
        case DoubleType | LongType | IntegerType => ()
        case other => throw new IllegalArgumentException(
          s"skyline dimensions must be double/bigint/int, got ${other.catalogString}")
      }
    }
    def keyOf(dim: Expression, row: InternalRow): Double = dim.eval(row) match {
      case null => Double.NegativeInfinity // NULL never dominates, never survives a dominator
      case d: java.lang.Double => d
      case l: java.lang.Long => l.toDouble
      case i: java.lang.Integer => i.toDouble
      case other => throw new IllegalStateException(s"unexpected dim value $other")
    }
    def dominates(a: Array[Double], b: Array[Double]): Boolean = {
      var ge = true; var gt = false; var i = 0
      while (i < a.length && ge) {
        if (a(i) < b(i)) ge = false else if (a(i) > b(i)) gt = true
        i += 1
      }
      ge && gt
    }
    def skyline(it: Iterator[InternalRow]): Iterator[InternalRow] = {
      val rows = it.map { r =>
        val copied = r.copy()
        (bound.map(keyOf(_, copied)).toArray, copied)
      }.toArray
      // FULL-lexicographic-descending scan: at the first differing
      // dimension a later row is strictly smaller, so a later row can
      // never dominate an earlier one and one forward pass against the
      // kept frontier is complete. (Sorting by the first dimension
      // alone is NOT enough: under dim-0 ties a later row with a larger
      // second dimension dominates an already-kept earlier row — caught
      // by the randomized dominance law in PropertiesSpec.)
      def lexGreater(a: Array[Double], b: Array[Double]): Boolean = {
        var i = 0
        while (i < a.length) {
          if (a(i) > b(i)) return true
          if (a(i) < b(i)) return false
          i += 1
        }
        false
      }
      val sorted = rows.sortWith { case ((ka, _), (kb, _)) => lexGreater(ka, kb) }
      val kept = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], InternalRow)]
      sorted.foreach { case (k, r) =>
        if (!kept.exists { case (kk, _) => dominates(kk, k) }) kept += ((k, r))
      }
      kept.iterator.map(_._2)
    }
    child.execute()
      .mapPartitions(skyline)     // corpus-sized pass, no shuffle
      .coalesce(1)
      .mapPartitions(skyline)     // frontier candidates only
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SkylineExec =
    copy(child = newChild)
}

/** Optimizer rule: push `dim >= c` / `dim > c` filters BELOW a skyline
  * — the tier-(c) operator participating in optimization, not just
  * execution. Sound exactly for lower-bound predicates on MAXIMIZED
  * dimensions: any dominator q of a surviving row r has q.dim ≥ r.dim
  * ≥ c, so q also passes the filter — dominance status inside the
  * filtered set equals dominance in the full set, and
  * Filter(p, Skyline(S)) ≡ Skyline(Filter(p, S)) with no residual.
  * (An upper-bound or non-dimension predicate does NOT commute — it
  * could delete a dominator and resurrect dominated rows — and is left
  * above.) At 100 TB this turns "frontier of the expensive subset"
  * from a full-corpus skyline into a pruned scan, and lets Catalyst
  * push the relocated filter all the way into the source. */
object PushFilterThroughSkyline
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, Attribute, GreaterThan, GreaterThanOrEqual, Literal}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, SkylinePlan(dims, child)) =>
      def isDim(a: Attribute) = dims.exists(_.semanticEquals(a))
      val (pushable, rest) =
        splitConjunctivePredicates(cond).partition {
          case GreaterThanOrEqual(a: Attribute, Literal(_, _)) => isDim(a)
          case GreaterThan(a: Attribute, Literal(_, _)) => isDim(a)
          case _ => false
        }
      if (pushable.isEmpty) f
      else {
        val pushed = SkylinePlan(dims,
          Filter(pushable.reduce(And), child))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object Skyline {
  /** Pareto frontier of `df` maximizing every named column in `dims`.
    * Dimension attributes are resolved against the child's analyzed
    * output HERE (generic analyzer rules don't resolve expressions
    * inside foreign plan nodes), so the plan enters the session fully
    * resolved. Injects [[SkylineStrategy]] into the session planner on
    * first use (idempotent) — the `spark.experimental.extraStrategies`
    * route, so no session-construction config is required. */
  def of(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "skyline needs at least one dimension")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(SkylineStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ SkylineStrategy
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughSkyline))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughSkyline
    val child = df.queryExecution.analyzed
    val attrs = dims.map { n =>
      child.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"skyline dimension $n not in ${child.output.map(_.name).mkString(", ")}"))
    }
    org.apache.spark.sql.graft.DatasetBridge.ofRows(spark,
      SkylinePlan(attrs, child))
  }
}
