package graft.sources

import java.time.LocalDate
import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("graft-ohlcv")` — the reference's per-symbol OHLCV
  * acquisition (R5, `stock_data_airflow_local_aws_s3.py:36-42`) as a REAL
  * DataSourceV2 `TableProvider` instead of a driver loop over an HTTP
  * client: Spark plans a `BatchScan` whose input partitions are symbol
  * chunks, and every executor generates its chunk's series in parallel
  * (deterministic hash-seeded walk — the offline stand-in for the network
  * fetch; swapping a fetching `PartitionReader` in would not change any
  * plumbing).
  *
  * Options: `symbols` (comma-separated, required), `startDate`
  * (yyyy-MM-dd, default 2000-01-01), `days` (calendar days spanned,
  * default 60; weekends skipped), `numPartitions` (default 8).
  *
  * Scale posture: partition = symbol chunk → reading N symbols across E
  * executors is embarrassingly parallel; column pruning is pushed into the
  * reader (`SupportsPushDownRequiredColumns`), so `select("company")`
  * never computes a price.
  */
class OhlcvDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-ohlcv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OhlcvTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new OhlcvTable(new CaseInsensitiveStringMap(properties))
}

object OhlcvTable {
  /** The prices fact schema (SURVEY.md §1.1), incl. the reference's
    * literal "Adj Close" column name (space preserved). */
  val schema: StructType = StructType(Seq(
    StructField("company", StringType, nullable = false),
    StructField("year", IntegerType, nullable = false),
    StructField("Date", TimestampType, nullable = false),
    StructField("Open", DoubleType, nullable = false),
    StructField("High", DoubleType, nullable = false),
    StructField("Low", DoubleType, nullable = false),
    StructField("Close", DoubleType, nullable = false),
    StructField("Adj Close", DoubleType, nullable = false),
    StructField("Volume", LongType, nullable = false)))
}

class OhlcvTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "graft-ohlcv"
  override def schema(): StructType = OhlcvTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(o.asCaseSensitiveMap())
    new OhlcvScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

class OhlcvScanBuilder(options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = OhlcvTable.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val symbols = Option(options.get("symbols")).map(_.split(',').map(_.trim)
      .filter(_.nonEmpty)).getOrElse(Array.empty[String])
    require(symbols.nonEmpty, "graft-ohlcv requires option 'symbols' (comma-separated)")
    val transport = options.getOrDefault("transport", "synthetic")
    require(transport == "synthetic" || transport == "http",
      s"graft-ohlcv transport must be 'synthetic' or 'http', got '$transport'")
    val endpoint = options.getOrDefault("endpoint", "")
    require(transport != "http" || endpoint.nonEmpty,
      "graft-ohlcv transport=http requires option 'endpoint'")
    new OhlcvScan(symbols,
      options.getOrDefault("startDate", "2000-01-01"),
      options.getInt("days", 60),
      options.getInt("numPartitions", 8),
      required,
      OhlcvFetch.Config(transport, endpoint,
        options.getInt("maxRetries", 3), options.getLong("retryBackoffMs", 1000L)))
  }
}

case class OhlcvInputPartition(symbols: Array[String], startDate: String,
                               days: Int, schema: StructType,
                               fetch: OhlcvFetch.Config) extends InputPartition

class OhlcvScan(symbols: Array[String], startDate: String, days: Int,
                numPartitions: Int, required: StructType,
                fetch: OhlcvFetch.Config) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-ohlcv transport=${fetch.transport} symbols=${symbols.length} " +
      s"start=$startDate days=$days"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, math.min(numPartitions, symbols.length))
    // contiguous symbol chunks: deterministic, balanced within one row
    symbols.sorted.grouped(math.ceil(symbols.length.toDouble / n).toInt)
      .map(chunk => OhlcvInputPartition(chunk, startDate, days, required, fetch))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OhlcvReaderFactory
}

class OhlcvReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[OhlcvInputPartition]
    if (p.fetch.transport == "http") new OhlcvHttpPartitionReader(p)
    else new OhlcvPartitionReader(p)
  }
}

/** Generates each symbol's trading-day rows for ONLY the pruned columns —
  * prices are computed lazily, so a `select("company", "year")` scan never
  * hashes a bar. */
class OhlcvPartitionReader(p: OhlcvInputPartition) extends PartitionReader[InternalRow] {
  private val start = LocalDate.parse(p.startDate)
  private val fields = p.schema.fieldNames

  private var symIdx = 0
  private var dayIdx = -1L
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (symIdx < p.symbols.length) {
      dayIdx += 1
      if (dayIdx >= p.days) { symIdx += 1; dayIdx = -1L }
      else {
        val date = start.plusDays(dayIdx)
        if (OhlcvGen.isTradingDay(date)) {
          current = row(p.symbols(symIdx), date)
          return true
        }
      }
    }
    false
  }

  private def row(sym: String, date: LocalDate): InternalRow = {
    val symU = UTF8String.fromString(sym)
    lazy val bar = OhlcvGen.bar(symU, dayIdx)
    val values = fields.map {
      case "company"   => symU
      case "year"      => date.getYear
      case "Date"      => OhlcvGen.midnightMicros(date)
      case "Open"      => bar.open
      case "High"      => bar.high
      case "Low"       => bar.low
      case "Close"     => bar.close
      case "Adj Close" => bar.adjClose
      case "Volume"    => bar.volume
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
