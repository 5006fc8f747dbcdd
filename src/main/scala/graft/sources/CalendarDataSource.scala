package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 calendar source with time-filter pushdown — the S1
  * pattern: a scene/file catalog whose "partitions" are time chunks, with
  * query time bounds pushed into partition planning so out-of-range
  * chunks are never even enumerated (SURVEY §4: custom DSv2 source with
  * `SupportsPushDownFilters` for time-prefix pruning).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.CalendarDataSource")
  *   .option("t0", "2024-01-01 00:00:00").option("t1", "2024-06-30 23:00:00")
  *   .option("stepMinutes", "60").option("chunkHours", "168")
  *   .load()                       // schema: (time TIMESTAMP, scene_id STRING)
  *   .where($"time" >= "2024-03-01")   // prunes whole week-chunks at plan time
  * }}}
  *
  * On a real deployment the row emission would be an S3 key-prefix
  * listing per chunk (noaa-goes16 style); here rows are the generated
  * timeline itself — the pruning machinery is identical.
  */
class CalendarDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CalendarDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CalendarTable(
      properties.get("t0"), properties.get("t1"),
      Option(properties.get("stepMinutes")).map(_.toLong).getOrElse(60L),
      Option(properties.get("chunkHours")).map(_.toLong).getOrElse(24L * 7))
}

object CalendarDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("time", TimestampType, nullable = false),
    StructField("scene_id", StringType, nullable = false)))

  def parseUs(s: String): Long =
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
}

class CalendarTable(t0: String, t1: String, stepMinutes: Long, chunkHours: Long)
    extends Table with SupportsRead {
  require(t0 != null && t1 != null, "graft-calendar needs t0 and t1 options")
  override def name(): String = s"graft-calendar[$t0..$t1]"
  override def schema(): StructType = CalendarDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CalendarScanBuilder(
      CalendarDataSource.parseUs(t0), CalendarDataSource.parseUs(t1),
      stepMinutes * 60000000L, chunkHours * 3600000000L)
}

class CalendarScanBuilder(t0Us: Long, t1Us: Long, stepUs: Long, chunkUs: Long)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = t0Us
  private var hi = t1Us
  private var pushed = Array.empty[Filter]
  private var required: StructType = CalendarDataSource.Schema

  /** Column pruning: a `select("time")` never pays for scene-id string
    * formatting — the reader emits only the requested fields. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Narrow [lo, hi] from time comparisons; everything else stays a
    * post-scan filter (we return non-time filters as residual). A time
    * filter is claimed as fully source-enforced ONLY when its literal
    * converts exactly to microseconds — an unconvertible literal type
    * stays residual so Spark re-applies it post-scan instead of being
    * silently mis-enforced. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    // full microsecond precision: Timestamp/Instant carry sub-millisecond
    // micros that getTime/toEpochMilli would drop
    def us(v: Any): Option[Long] = v match {
      case t: java.sql.Timestamp => Some(DateTimeUtils.fromJavaTimestamp(t))
      case i: java.time.Instant => Some(DateTimeUtils.instantToMicros(i))
      case l: java.time.LocalDateTime => Some(DateTimeUtils.localDateTimeToMicros(l))
      case s: String => scala.util.Try(CalendarDataSource.parseUs(s)).toOption
      case _ => None
    }
    val (time, residual) = filters.partition {
      case GreaterThan("time", v) => us(v).isDefined
      case GreaterThanOrEqual("time", v) => us(v).isDefined
      case LessThan("time", v) => us(v).isDefined
      case LessThanOrEqual("time", v) => us(v).isDefined
      case _ => false
    }
    time.foreach {
      case GreaterThan("time", v) => lo = math.max(lo, us(v).get + 1)
      case GreaterThanOrEqual("time", v) => lo = math.max(lo, us(v).get)
      case LessThan("time", v) => hi = math.min(hi, us(v).get - 1)
      case LessThanOrEqual("time", v) => hi = math.min(hi, us(v).get)
      case _ =>
    }
    pushed = time
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new CalendarScan(lo, hi, stepUs, chunkUs, required)
}

/** One InputPartition per time chunk intersecting the (pushed-down)
  * bounds — the partition count IS the pruning observable. */
case class CalendarChunk(startUs: Long, endUs: Long, stepUs: Long) extends InputPartition

class CalendarScan(loUs: Long, hiUs: Long, stepUs: Long, chunkUs: Long,
    schema: StructType = CalendarDataSource.Schema)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-calendar scan [${loUs}us..${hiUs}us] step=${stepUs}us cols=${schema.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    if (loUs > hiUs) Array.empty
    else {
      val firstChunk = loUs / chunkUs
      val lastChunk = hiUs / chunkUs
      (firstChunk to lastChunk).map { c =>
        CalendarChunk(math.max(loUs, c * chunkUs), math.min(hiUs, (c + 1) * chunkUs - 1), stepUs)
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CalendarReaderFactory(schema.fieldNames)
}

/** Standalone factory (ships to executors — must not capture the Scan). */
class CalendarReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val chunk = partition.asInstanceOf[CalendarChunk]
    new PartitionReader[InternalRow] {
      // first step-aligned tick >= chunk start (ticks are global-aligned)
      private var cur = ((chunk.startUs + chunk.stepUs - 1) / chunk.stepUs) * chunk.stepUs
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (cur > chunk.endUs) false
        else {
          // emit only the pruned columns; scene-id formatting is paid
          // only when scene_id was actually requested
          val values: Array[Any] = cols.map {
            case "time" => cur
            case "scene_id" =>
              val id = java.time.Instant.ofEpochMilli(cur / 1000)
                .atOffset(java.time.ZoneOffset.UTC)
                .format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmm"))
              org.apache.spark.unsafe.types.UTF8String.fromString(s"cal__$id")
            case other => throw new IllegalArgumentException(s"unknown column $other")
          }
          row = InternalRow.fromSeq(values.toIndexedSeq)
          cur += chunk.stepUs
          true
        }
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
