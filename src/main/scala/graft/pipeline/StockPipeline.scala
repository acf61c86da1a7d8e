package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.IngestEgress

/** The faithful core (SURVEY.md §2.A R1–R14): the reference pipeline's
  * complete dataflow — symbol ingest, screening, per-symbol OHLCV
  * acquisition, Year derivation, Hive-partitioned Snappy Parquet sink —
  * re-expressed as declarative, data-parallel Spark.
  *
  * Where the reference loops rows on the driver and calls yfinance per
  * symbol (`stock_data_airflow_local_aws_s3.py:110-112`, R4/R5), this
  * engine generates/acquires per-symbol series DISTRIBUTED: the symbol
  * dimension crosses a calendar dimension on executors — no driver loop,
  * no filesystem hand-off between stages (SURVEY.md §3.3), and per-symbol
  * fault isolation (R6) becomes a quarantine split instead of a
  * swallow-and-print.
  */
object StockPipeline {

  /** `company_tick_symbols_processed.csv` schema (FIXTURES.md §B),
    * declared not inferred (reference: `pd.read_csv`, R1). */
  val symbolsSchema: StructType = StructType(Seq(
    StructField("Symbol", StringType), StructField("Company_Name", StringType),
    StructField("Sector", StringType), StructField("Data_Exising", StringType),
    StructField("History_Existing", StringType), StructField("IPO_Year", StringType),
    StructField("Country", StringType), StructField("Industry", StringType)))

  /** R1 + R13 casts: dirty-typed strings -> typed nullable columns. */
  def loadSymbols(spark: SparkSession, path: String): DataFrame =
    IngestEgress.readCsv(spark, path, symbolsSchema).select(
      col("Symbol"), col("Company_Name"), col("Sector"),
      IngestEgress.parseDirtyBool(col("Data_Exising")).as("data_existing"),
      IngestEgress.parseDirtyNumber(col("History_Existing")).as("history_days"),
      IngestEgress.parseDirtyNumber(col("IPO_Year")).cast("int").as("ipo_year"),
      col("Country"), col("Industry"))

  /** R5 replacement (offline): deterministic synthetic OHLCV — a hash-seeded
    * random walk per (symbol, day), generated ON EXECUTORS from a
    * symbols x calendar cross (broadcast x range), never a driver loop.
    * Weekends excluded to mimic trading days. */
  def syntheticPrices(spark: SparkSession, symbols: DataFrame,
                      startDate: String, days: Int): DataFrame = {
    val calendar = spark.range(0, days.toLong)
      .select(date_add(to_date(lit(startDate)), col("id").cast("int")).as("date_"),
        col("id").as("day_idx"))
      .where(!weekday(col("date_")).isin(5, 6)) // Mon..Fri only
    // unit-interval hash noise per (symbol, day): deterministic, seedable
    def u(salt: Int) = pmod(xxhash64(col("Symbol"), col("day_idx"), lit(salt)),
      lit(1000000L)).cast("double") / 1000000.0
    symbols.select("Symbol").join(broadcast(calendar))
      .withColumn("base", lit(50.0) + (pmod(xxhash64(col("Symbol")), lit(100L))).cast("double"))
      .withColumn("drift", (u(1) - 0.5) * 4.0)
      .select(
        col("Symbol").as("company"),
        year(col("date_")).as("year"),
        col("date_").cast("timestamp").as("Date"),
        round(col("base") + col("drift"), 2).as("Open"),
        round(col("base") + col("drift") + u(2) * 2.0, 2).as("High"),
        round(greatest(col("base") + col("drift") - u(3) * 2.0, lit(0.01)), 2).as("Low"),
        round(col("base") + col("drift") + (u(4) - 0.5) * 2.0, 2).as("Close"),
        round((col("base") + col("drift") + (u(4) - 0.5) * 2.0) * 0.98, 2).as("Adj Close"),
        (pmod(xxhash64(col("Symbol"), col("day_idx"), lit(9)), lit(1000000L)) + 100L).as("Volume"))
  }

  /** R5 via the registered Spark source: the same deterministic series
    * served as a REAL `DataSourceV2` scan (`graft.sources.OhlcvDataSource`,
    * format "graft-ohlcv") — Spark plans a BatchScan over symbol-chunk
    * input partitions, with column pruning pushed into the reader. Same
    * rows, bitwise, as [[syntheticPrices]] (asserted by OhlcvSourceSpec). */
  def acquirePrices(spark: SparkSession, symbols: Seq[String],
                    startDate: String, days: Int): DataFrame =
    spark.read.format("graft-ohlcv")
      .option("symbols", symbols.mkString(","))
      .option("startDate", startDate)
      .option("days", days.toString)
      .load()

  /** R6 fault isolation as a dataflow split: rows failing validation go to
    * a quarantine frame instead of being silently skipped with a print.
    * Returns (clean, quarantined). */
  def validateSplit(prices: DataFrame): (DataFrame, DataFrame) = {
    val bad = col("Open").isNull || col("Close").isNull ||
      col("High") < col("Low") || col("Volume") <= 0
    (prices.where(!bad), prices.where(bad).withColumn("quarantine_reason",
      when(col("High") < col("Low"), "high<low")
        .when(col("Volume") <= 0, "bad volume")
        .otherwise("null price")))
  }

  /** R13 screening: keep only symbols whose day count equals the modal
    * (expected) history length — the 6,969 -> 1,062 screen as a dataflow. */
  def screenFullHistory(prices: DataFrame): DataFrame = {
    val counts = prices.groupBy("company").agg(count(lit(1)).as("n_days"))
    val expected = counts.groupBy("n_days").count()
      .orderBy(col("count").desc, col("n_days").desc).limit(1)
      .select(col("n_days").as("expected_days"))
    counts.join(broadcast(expected), col("n_days") === col("expected_days"), "left_semi")
      .select("company")
  }

  /** R9/R10/R11: the Hive-partitioned Snappy sink (company=/year=), one
    * well-sized file per partition. S3 is a path-scheme change (s3a://),
    * not code (SURVEY.md §7.5). Returns the relational manifest shadow. */
  def sink(prices: DataFrame, path: String): DataFrame = {
    IngestEgress.writePartitioned(prices, path, Seq("company", "year"))
    IngestEgress.partitionManifest(prices, Seq(col("company"), col("year")))
  }

  /** The whole DAG (R14): ingest -> generate -> validate -> screen -> sink.
    * One Spark job graph; no filesystem hand-offs between stages. */
  def run(spark: SparkSession, symbolsCsv: String, outPath: String,
          startDate: String = "2000-01-01", days: Int = 60): PipelineResult = {
    val symbols = loadSymbols(spark, symbolsCsv)
    val raw = syntheticPrices(spark, symbols, startDate, days)
    finish(symbols, raw, outPath)
  }

  /** [[run]] with acquisition through the graft-ohlcv DataSourceV2 scan.
    * The symbol list becomes driver-side source CONFIG — a bounded (≤7k)
    * dimension, exactly what the reference hands its fetcher
    * (`...py:110-112`) — not a data collect. */
  def runFromSource(spark: SparkSession, symbolsCsv: String, outPath: String,
                    startDate: String = "2000-01-01", days: Int = 60): PipelineResult = {
    val symbols = loadSymbols(spark, symbolsCsv)
    val symList = symbols.select("Symbol").where(col("Symbol").isNotNull)
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSeq
    val raw = acquirePrices(spark, symList, startDate, days)
    finish(symbols, raw, outPath)
  }

  private def finish(symbols: DataFrame, raw: DataFrame,
                     outPath: String): PipelineResult = {
    val (clean, quarantined) = validateSplit(raw)
    val keep = screenFullHistory(clean)
    val screened = clean.join(broadcast(keep), Seq("company"), "left_semi")
    val manifest = sink(screened, outPath)
    PipelineResult(symbols, screened, quarantined, manifest)
  }

  case class PipelineResult(symbols: DataFrame, prices: DataFrame,
                            quarantined: DataFrame, manifest: DataFrame)
}
