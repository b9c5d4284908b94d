package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
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
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required = GenSource.schema

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
  override def build(): Scan = new GenScan(rows, parts, lo, hi, required)
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
