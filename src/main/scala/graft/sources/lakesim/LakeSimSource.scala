package graft.sources.lakesim

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 simulation of the reference's paginated data-lake scan
  * (SURVEY.md §2.1, S1-S8):
  *
  *   - the lake's split-query planner (`query_split` → one query filter per
  *     chunk, reference datalakewrapper.py:69-86) becomes
  *     `planInputPartitions()`: one InputPartition per data object, pruned
  *     by pushed filters against the index's per-object value ranges;
  *   - the filter-in-URL pushdown (`_lplFilter`, fsmwrapper.py:169;
  *     `create_filter`, utilities/utilities.py:226-238) becomes
  *     `SupportsPushDownFilters` — accepted filters are evaluated
  *     record-side in the reader, exactly like the server would;
  *   - the 276-field `_fields` projection (fsmwrapper.py:164) becomes
  *     `SupportsPushDownRequiredColumns` — only requested fields are
  *     extracted from each NDJSON record;
  *   - the 10k-record page (datalakewrapper.py:88) becomes the `pageSize`
  *     option: oversized objects split into multiple partitions.
  *
  * Layout on disk (the "lake"): a directory with `index.json` (one entry
  * per data object: file, record count, per-field min/max ranges) and one
  * NDJSON file per object. At cluster scale each partition reads one
  * object/page — the same parallelism the reference got from its split
  * filters and per-key threads.
  */
class LakeSimSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "lakesim requires an explicit schema (metadata-driven, no inference)")

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("lakesim: 'path' option is required"))
    val pageSize = opts.getInt("pagesize", 10000)
    // objects admitted per micro-batch on the streaming side (0 = all
    // available); under Trigger.AvailableNow this turns one giant
    // catch-up batch into bounded per-batch commit boundaries
    val maxObjects = opts.getInt("maxobjectsperbatch", 0)
    // time travel (batch reads only): read the lake as commit N left it
    val versionAsOf = opts.getInt("versionasof", 0)
    new LakeSimTable(path, schema, pageSize, maxObjects, versionAsOf)
  }
}

class LakeSimTable(path: String, tableSchema: StructType, pageSize: Int,
                   maxObjectsPerBatch: Int = 0, versionAsOf: Int = 0)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"lakesim($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeSimScanBuilder(path, tableSchema, pageSize, maxObjectsPerBatch,
      versionAsOf)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new LakeSimWriteBuilder(path, info.schema(),
      copyPublish = "copy".equalsIgnoreCase(info.options().get("publish")),
      versioned = "true".equalsIgnoreCase(info.options().get("versioned")),
      // comma-separated fields to index with per-object bloom filters
      // (equality-predicate data skipping; integral + string fields only)
      bloomFields = Option(info.options().get("bloomfields"))
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty))
}

class LakeSimScanBuilder(path: String, tableSchema: StructType, pageSize: Int,
                         maxObjectsPerBatch: Int = 0, versionAsOf: Int = 0)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = tableSchema
  private var countStars: Int = 0

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition(LakeIndex.supportedFilter)
    pushed = supported
    rest // Spark re-applies these above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private var pushedAggs: Seq[LakeAggSpec] = Seq.empty

  /** COUNT(*) / MIN / MAX answered from the INDEX ALONE — the
    * reference's data-object-properties exist precisely so the lake can
    * state cardinality and field ranges without shipping records (A2 /
    * S2); a fully-pushed aggregate never opens a data object. Accepted
    * ONLY with no pushed filters and no grouping (pushdown order
    * guarantees filters arrive first — a filter makes the per-object
    * stats bounds, not answers), and MIN/MAX only for numeric fields
    * whose range every object declares AND whose values the stored
    * double carries exactly (integral fields beyond 2^53 reject — the
    * range lost precision at write time, so the scan must read data). */
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    if (pushed.nonEmpty || agg.groupByExpressions().nonEmpty ||
        agg.aggregateExpressions().isEmpty) return false
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case nr: org.apache.spark.sql.connector.expressions.NamedReference
          if nr.fieldNames.length == 1 => Some(nr.fieldNames.head)
      case _ => None
    }
    val entries =
      try LakeIndex.load(path, versionAsOf)
      catch { case _: Exception => return false }
    def rangeable(f: String): Boolean = {
      val field = tableSchema.fields.find(_.name == f)
      val numericOk = field.exists(_.dataType match {
        case DoubleType | FloatType | IntegerType | ShortType => true
        case LongType =>
          // a long range survived the double round trip only below 2^53
          entries.forall(_.ranges.get(f).forall { case (lo, hi) =>
            math.abs(lo) <= (1L << 53).toDouble &&
              math.abs(hi) <= (1L << 53).toDouble
          })
        case _ => false
      })
      numericOk && entries.forall(_.ranges.contains(f))
    }
    val specs = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(LakeAggSpec("count", ""))
      case m: Min => fieldOf(m.column).filter(rangeable)
        .map(LakeAggSpec("min", _))
      case m: Max => fieldOf(m.column).filter(rangeable)
        .map(LakeAggSpec("max", _))
      case _ => None
    }
    if (specs.forall(_.isDefined)) {
      pushedAggs = specs.flatten
      countStars = pushedAggs.count(_.op == "count")
      true
    } else false
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = pushAggregation(agg)

  override def build(): Scan =
    if (pushedAggs.nonEmpty)
      new LakeSimAggScan(path, tableSchema, pushedAggs, versionAsOf)
    else new LakeSimScan(path, tableSchema, required, pushed, pageSize,
      maxObjectsPerBatch, versionAsOf)
}

final case class LakeAggSpec(op: String, field: String)

/** Metadata-only scan for completely-pushed COUNT(*)/MIN/MAX: one
  * partition, one row, answered from the index's declared per-object
  * counts and field ranges. Zero data I/O. An empty lake yields
  * count=0 and NULL extrema (the aggregate-over-nothing answers). */
class LakeSimAggScan(path: String, tableSchema: StructType,
                     aggs: Seq[LakeAggSpec], versionAsOf: Int = 0)
    extends Scan with Batch {
  private def fieldType(f: String): DataType =
    tableSchema.fields.find(_.name == f).map(_.dataType).getOrElse(DoubleType)
  override def readSchema(): StructType = StructType(
    aggs.zipWithIndex.map {
      case (LakeAggSpec("count", _), i) =>
        StructField(s"count_star_$i", LongType, nullable = false)
      case (LakeAggSpec(op, f), i) =>
        StructField(s"${op}_${f}_$i", fieldType(f), nullable = true)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"lakesim path=$path aggPushed=[${aggs.map(a =>
      if (a.op == "count") "count(*)" else s"${a.op}(${a.field})")
      .mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] = {
    val entries = LakeIndex.load(path, versionAsOf)
    val values: Seq[Any] = aggs.map {
      case LakeAggSpec("count", _) => entries.map(_.count).sum
      case LakeAggSpec(op, f) =>
        val ranges = entries.flatMap(_.ranges.get(f))
        if (ranges.isEmpty) null
        else {
          val v = if (op == "min") ranges.map(_._1).min
                  else ranges.map(_._2).max
          fieldType(f) match {
            case LongType => v.toLong
            case IntegerType => v.toInt
            case ShortType => v.toShort
            case FloatType => v.toFloat
            case _ => v
          }
        }
    }
    Array(LakeSimAggPartition(values))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val part = p.asInstanceOf[LakeSimAggPartition]
          private var served = false
          override def next(): Boolean = { val r = !served; served = true; r }
          override def get(): InternalRow =
            InternalRow.fromSeq(part.values)
          override def close(): Unit = ()
        }
    }
}

case class LakeSimAggPartition(values: Seq[Any]) extends InputPartition

class LakeSimScan(path: String, tableSchema: StructType,
                  required: StructType, pushed: Array[Filter], pageSize: Int,
                  maxObjectsPerBatch: Int = 0, versionAsOf: Int = 0)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    // a stream tails the LIVE index by definition; a pinned historical
    // version can never produce new offsets — reject loudly
    if (versionAsOf > 0) throw new IllegalArgumentException(
      "lakesim: versionAsOf is batch-only (a stream tails the live index)")
    new LakeSimMicroBatchStream(path, required, pushed, pageSize,
      maxObjectsPerBatch)
  }
  override def description(): String =
    s"lakesim path=$path pushed=[${pushed.mkString(", ")}] " +
      s"fields=[${required.fieldNames.mkString(",")}]"

  /** Split planning: one partition per (pruned) object page. */
  override def planInputPartitions(): Array[InputPartition] = {
    val entries = LakeIndex.load(path, versionAsOf)
    val surviving = LakeIndex.prune(entries, pushed)
    surviving.flatMap { e =>
      val pages = math.max(1L, (e.count + pageSize - 1) / pageSize)
      (0L until pages).map(p =>
        LakeSimPartition(s"$path/${e.file}", p * pageSize, pageSize,
          required, pushed): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LakeSimReaderFactory
}

final case class LakeSimPartition(file: String, startRecord: Long,
                                  pageSize: Int, required: StructType,
                                  pushed: Array[Filter]) extends InputPartition

class LakeSimReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new LakeSimPartitionReader(p.asInstanceOf[LakeSimPartition])
}

/** Shared JSON-value → InternalRow conversion for the lakesim readers. */
object JsonRecords {

  /** Flatten a JSON object node to a value map. Integral JSON numbers stay
    * Long — routing them through Double would silently lose precision for
    * 64-bit ids above 2^53. */
  def valueMap(node: com.fasterxml.jackson.databind.JsonNode): Map[String, Any] =
    node.properties().asScala.map { e =>
      val v = e.getValue
      e.getKey -> (if (v.isNull) null
                   else if (v.isIntegralNumber) v.asLong()
                   else if (v.isNumber) v.asDouble()
                   else if (v.isBoolean) v.asBoolean()
                   else v.asText())
    }.toMap

  /** Project a value map onto the required schema. */
  def toRow(values: Map[String, Any], required: StructType): InternalRow =
    InternalRow.fromSeq(required.fields.toIndexedSeq.map { f =>
      values.get(f.name).orNull match {
        case null => null
        case v => f.dataType match {
          case StringType => UTF8String.fromString(v.toString)
          case LongType => v match {
            case l: Long => l
            case d: Double => d.toLong
            case s: String => s.toLong
            case b: Boolean => if (b) 1L else 0L
          }
          case IntegerType => v match {
            case l: Long => l.toInt
            case d: Double => d.toInt
            case s: String => s.toInt
            case b: Boolean => if (b) 1 else 0
          }
          case DoubleType => v match {
            case l: Long => l.toDouble
            case d: Double => d
            case s: String => s.toDouble
            case b: Boolean => if (b) 1.0 else 0.0
          }
          case BooleanType => v.asInstanceOf[Boolean]
          case _ => null
        }
      }
    })
}

/** Reads one page of one data object's NDJSON, applying the pushed filters
  * and projecting the required fields — the simulated "server side". */
class LakeSimPartitionReader(p: LakeSimPartition)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  // stream the page lazily: a page partition holds pageSize records, never
  // the whole object in memory (a 10 GB object with 10k-row pages would
  // otherwise materialize fully in EVERY page partition)
  private val source = scala.io.Source.fromFile(p.file)
  private val lines = source.getLines()
    .slice(p.startRecord.toInt, p.startRecord.toInt + p.pageSize)
    .filter(_.nonEmpty)

  private var current: InternalRow = _

  override def next(): Boolean = {
    while (lines.hasNext) {
      val values = JsonRecords.valueMap(mapper.readTree(lines.next()))
      if (p.pushed.forall(f => LakeIndex.evalFilter(f, values))) {
        current = JsonRecords.toRow(values, p.required)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = source.close()
}
