package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Declared-schema loaders for the driver fixtures (FIXTURES.md §A).
  *
  * The reference never declares a schema — pandas infers CSV dtypes and
  * yfinance dictates the OHLCV frame
  * (`data_collection/dags/stock_data_airflow_local_aws_s3.py:36,98`). At
  * 100 TB that is fragile: a single drifting file re-types a whole scan. Our
  * engine declares `StructType`s explicitly and fails fast on drift
  * (SURVEY.md §1.3). Schemas below mirror the fixture parquet physical types
  * exactly, so the vectorized reader is used with zero cast overhead.
  */
object Tables {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType), StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType), StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType), StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType), StructField("p_name", StringType),
    StructField("p_brand", StringType), StructField("p_type", StringType),
    StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  // `events.ts` physical encoding has varied across fixture generations:
  // INT64 TIMESTAMP(NANOS) (no Spark ns type — read as long via
  // nanosAsLong, convert ns -> µs exactly; fixture values carry no sub-µs
  // component) or plain TIMESTAMP(MICROS). `load` probes the footer and
  // picks the right read path, so a regenerated fixture can't silently
  // shift every timestamp 1000x.
  val eventsNanos: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  val events: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "supplier" -> supplier,
    "customer" -> customer, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events, "documents" -> documents,
    "embeddings" -> embeddings)

  /** Load a fixture table with its declared schema. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // With nanosAsLong set, a TIMESTAMP(NANOS) column infers as LongType
      // while TIMESTAMP(MICROS) infers as TimestampType — one footer read
      // (no data scan) tells the two fixture generations apart.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val path = s"$sfDir/$name.parquet"
      spark.read.parquet(path).schema("ts").dataType match {
        case LongType =>
          spark.read.schema(eventsNanos).parquet(path)
            .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
        case _ =>
          spark.read.schema(events).parquet(path)
      }
    } else {
      spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
    }
  }
}
