package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Stable batch ids over ordered keys — the Spark re-expression of the
  * reference's stride-partitioned symbol batches
  * (`data_collection/dags/stock_data_airflow_local_aws_s3.py:105-109`:
  * `range(0, len, 100)` + `df.iloc[i:i+100]`). Position slicing has no
  * meaning on an unordered distributed Dataset; the deterministic equivalent
  * is `floor((row_number over (order by key) - 1)/size) + 1`
  * (SURVEY.md §2.A R3, §2.B Q-SINK2).
  */
object Batching {

  /** Dimension-scale path: global `row_number` window. Correct and free for
    * the reference's use (batching a ≤7k-row symbol list), but the
    * unpartitioned window plans as `Exchange SinglePartition` — one task
    * holds the whole table. For fact-scale inputs use [[batchByRange]].
    *
    * BOUND (runtime-enforced, r10): the input must stay under
    * [[graft.util.RowBound.DimensionScaleRows]] rows — the guard rides
    * the same single-partition window and fails fast instead of letting
    * a refactor feed a fact table through one task. */
  def withBatchNum(df: DataFrame, orderKey: String, size: Int): DataFrame = {
    val w = Window.orderBy(col(orderKey))
    df.withColumn("batch_num",
      graft.util.RowBound.guarded(
        floor((row_number().over(w) - 1) / lit(size)) + 1,
        w, graft.util.RowBound.DimensionScaleRows, "Batching.withBatchNum"))
  }

  /** Fact-scale path: same `floor((rank-1)/size)+1` batch ids with NO
    * single-partition stage. Two passes:
    *
    *   1. `repartitionByRange(orderKey)` + `sortWithinPartitions` — the
    *      range partitioner samples boundaries, so partition *i* holds a
    *      contiguous key range below partition *i+1*'s and each partition
    *      is locally sorted. All parallel.
    *   2. `RDD.zipWithIndex` — one lightweight job collects the
    *      per-partition row COUNTS (one long per partition to the driver,
    *      not data), broadcasts the prefix offsets, and a second pass
    *      numbers rows locally per partition. Global rank = partition
    *      offset + local index; batch id = rank/size + 1.
    *
    * The shuffle files from pass 1 are written once and reused by both
    * jobs (same RDD lineage). Plan contains no `Exchange SinglePartition`
    * — asserted by `PlanShapeSpec`.
    *
    * Cost trade-off, made deliberately: the `RDD.zipWithIndex` hop
    * deserializes each row once (out of Tungsten). The pure-DataFrame
    * alternative — window over `spark_partition_id()` — would stay
    * codegen'd but adds a SECOND full-data hash shuffle; one extra
    * serialization pass beats one extra shuffle at fact scale.
    *
    * Determinism: ranks (hence batch ids) are total iff `orderKey` is a
    * total order over the input — pass a unique key or a composite
    * tie-broken sort expression (e.g. `struct(k, id)`), same contract as
    * any `row_number` use.
    *
    * @param partitions range-partition count; <=0 means
    *                   `spark.sql.shuffle.partitions`.
    */
  def batchByRange(df: DataFrame, orderKey: Column, size: Int,
                   partitions: Int = 0): DataFrame = {
    require(size > 0, s"batch size must be positive, got $size")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, orderKey).sortWithinPartitions(orderKey)
    val schema = StructType(ranged.schema.fields :+
      StructField("batch_num", LongType, nullable = false))
    val rows = ranged.rdd.zipWithIndex().map { case (row, rank) =>
      Row.fromSeq(row.toSeq :+ (rank / size + 1L))
    }
    spark.createDataFrame(rows, schema)
  }
}
