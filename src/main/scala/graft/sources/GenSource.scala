package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for a deterministic generated table — the
  * custom-source tier of the engine: at 100 TB the difference between a
  * source that merely streams bytes and one that PARTICIPATES in
  * planning (column pruning, filter pushdown, partition pruning) is the
  * difference between scanning everything and scanning what the query
  * needs. This source is the in-repo reference implementation of that
  * contract, exercised by `x_source_dsv2_pushdown` and GenSourceSpec.
  *
  * Table `graftgen` (options: `rows`, `parts`): one row per id in
  * [0, rows) with `bucket = id % 97` and `payload = md5(id)` — each
  * column a pure function of id, so a DuckDB range() oracle replays the
  * whole table with no data movement.
  *
  * Planning integration:
  *  - [[SupportsPushDownRequiredColumns]]: readers materialize ONLY the
  *    pruned schema, in its order — an unselected `payload` never pays
  *    its md5.
  *  - [[SupportsPushDownFilters]]: range/equality filters on `id`
  *    narrow the generated interval and are CONSUMED (not re-evaluated
  *    by Spark); everything else is returned as a residual for the
  *    post-scan filter. Partition planning then emits only the slices
  *    intersecting the pushed interval — true partition pruning, the
  *    DSv2 analogue of parquet row-group skipping.
  */
class GenSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graftgen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new GenTable(properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("parts", "8").toInt)
}

object GenSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
}

final class GenTable(rows: Long, parts: Int) extends Table with SupportsRead {
  require(rows >= 0 && parts > 0, s"need rows >= 0 and parts > 0, got $rows/$parts")
  override def name(): String = s"graftgen(rows=$rows)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, parts)
}

final class GenScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {
  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required = GenSource.schema
  private var pushedAgg: Option[Aggregation] = None
  private var pushedLimit: Option[Int] = None
  private var pushedTopNDesc: Option[Boolean] = None

  // ----- aggregate pushdown (COMPLETE): on an interval source,
  // ungrouped COUNT(*)/COUNT(id)/MIN(id)/MAX(id) are O(1) closed forms
  // of the (already filter-narrowed) [lo, hi) range — the scan answers
  // the query without generating a single row. Spark only attempts
  // aggregate pushdown when every filter was consumed, so the interval
  // is exact by the time this runs.
  private def isId(e: Expression): Boolean = e match {
    case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
    case _ => false
  }
  private def acceptable(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case c: Count => !c.isDistinct && isId(c.column)
        case m: Min => isId(m.column)
        case m: Max => isId(m.column)
        case _ => false
      }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    acceptable(agg)
  override def pushAggregation(agg: Aggregation): Boolean = {
    val ok = acceptable(agg)
    if (ok) pushedAgg = Some(agg)
    ok
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def bound(v: Any): Option[Long] = v match {
      case n: Number => Some(n.longValue())
      case _ => None
    }
    val (accepted, residual) = filters.partition {
      case GreaterThanOrEqual("id", v) => bound(v).exists { b => lo = math.max(lo, b); true }
      case GreaterThan("id", v)        => bound(v).exists { b => lo = math.max(lo, b + 1); true }
      case LessThanOrEqual("id", v)    => bound(v).exists { b => hi = math.min(hi, b + 1); true }
      case LessThan("id", v)           => bound(v).exists { b => hi = math.min(hi, b); true }
      case EqualTo("id", v)            => bound(v).exists { b => lo = math.max(lo, b); hi = math.min(hi, b + 1); true }
      case _ => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // ----- limit / top-N pushdown: on an interval source both are
  // interval TRUNCATIONS. LIMIT has no order contract, so returning
  // the interval HEAD is a complete implementation (isPartiallyPushed
  // = false -> Spark drops its own Limit; this source behaves like a
  // sorted file, making even unordered LIMIT deterministic). Top-N is
  // only accepted when the sort is exactly `id` (non-null), where the
  // top N ARE the interval head (asc) or tail (desc); it is reported
  // PARTIALLY pushed because readers always emit ascending ids, so
  // Spark keeps its Sort+Limit over the <= N surviving rows (a
  // trivially small re-sort) rather than trusting scan order.
  override def pushLimit(l: Int): Boolean = {
    pushedLimit = Some(l); true
  }
  override def isPartiallyPushed(): Boolean = pushedTopNDesc.isDefined
  override def pushTopN(orders: Array[SortOrder], l: Int): Boolean = {
    val ok = orders.length == 1 && isId(orders(0).expression())
    if (ok) {
      pushedLimit = Some(l)
      pushedTopNDesc =
        Some(orders(0).direction() == SortDirection.DESCENDING)
    }
    ok
  }

  override def build(): Scan = pushedAgg match {
    case Some(agg) => new GenAggScan(lo, hi, agg.aggregateExpressions)
    case None =>
      val (lo2, hi2) = (pushedLimit, pushedTopNDesc) match {
        case (Some(l), Some(true)) => (math.max(lo, hi - l), hi)
        case (Some(l), _) => (lo, math.min(hi, lo + l))
        case _ => (lo, hi)
      }
      new GenScan(rows, parts, lo2, hi2, required)
  }
}

/** Completely-pushed aggregate scan: one partition, one row, values
  * computed on the DRIVER from the filtered interval — the 100 TB
  * payoff of a source that participates in planning (a metadata-only
  * answer, the DSv2 analogue of parquet footer count(*)). Empty
  * interval → count 0, MIN/MAX NULL (SQL semantics). */
final class GenAggScan(lo: Long, hi: Long, funcs: Array[AggregateFunc])
    extends Scan with Batch {
  private val n = math.max(0L, hi - lo)
  private val values: Array[Any] = funcs.map {
    case _: CountStar => n
    case _: Count => n // non-distinct count of the non-null id column
    case _: Min => if (n > 0) lo else null
    case _: Max => if (n > 0) hi - 1 else null
    case other => throw new IllegalArgumentException(
      s"unsupported pushed aggregate $other")
  }
  override def readSchema(): StructType = StructType(funcs.zipWithIndex.map {
    case (_: CountStar, i) => StructField(s"agg$i", LongType, nullable = false)
    case (_: Count, i)     => StructField(s"agg$i", LongType, nullable = false)
    case (_, i)            => StructField(s"agg$i", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftGenAgg pushedIdRange=[$lo,$hi) " +
      s"aggPushed=${funcs.map(_.toString).mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GenPartition(0L, 1L))
  override def createReaderFactory(): PartitionReaderFactory =
    new GenAggReaderFactory(values)
}

final class GenAggReaderFactory(values: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(values.toSeq)
      override def close(): Unit = ()
    }
}

final class GenScan(rows: Long, parts: Int, lo: Long, hi: Long,
                    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftGen rows=$rows parts=$parts pushedIdRange=[$lo,$hi) " +
      s"cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + parts - 1) / parts)
    (0 until parts).iterator.flatMap { p =>
      val s = p * per
      val e = math.min(rows, s + per)
      val a = math.max(s, lo)
      val b = math.min(e, hi)
      if (a < b) Some(GenPartition(a, b): InputPartition) else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required)
}

final case class GenPartition(start: Long, end: Long) extends InputPartition

final class GenReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GenPartition]
    // column generators resolved ONCE per reader against the pruned
    // schema — per-row work is exactly the requested columns
    val gens: Array[Long => Any] = required.fields.map(_.name match {
      case "id"      => (id: Long) => id
      case "bucket"  => (id: Long) => (id % 97).toInt
      case "payload" => (id: Long) => UTF8String.fromString(GenSource.md5hex(id.toString))
      case other => throw new IllegalArgumentException(s"unknown column $other")
    })
    new PartitionReader[InternalRow] {
      private var cur = gp.start - 1
      override def next(): Boolean = { cur += 1; cur < gp.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(gens.toSeq.map(_(cur)))
      override def close(): Unit = ()
    }
  }
}
