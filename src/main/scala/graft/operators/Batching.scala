package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stable batch ids over ordered keys — the Spark re-expression of the
  * reference's stride-partitioned symbol batches
  * (`data_collection/dags/stock_data_airflow_local_aws_s3.py:105-109`:
  * `range(0, len, 100)` + `df.iloc[i:i+100]`). Position slicing has no
  * meaning on an unordered distributed Dataset; the deterministic equivalent
  * is `floor((row_number over (order by key) - 1)/size) + 1`
  * (SURVEY.md §2.A R3, §2.B Q-SINK2).
  *
  * Scale note: a global row_number forces a single-partition window. For the
  * reference's use (batching a ≤7k-row dimension list) that is correct and
  * free; for billion-row fact tables use `batchByRange`, which computes
  * range boundaries from a sampled sort (no single-task bottleneck).
  */
object Batching {

  def withBatchNum(df: DataFrame, orderKey: String, size: Int): DataFrame = {
    val w = Window.orderBy(col(orderKey))
    df.withColumn("batch_num",
      floor((row_number().over(w) - 1) / lit(size)) + 1)
  }

  /** Scale path: approximate equal-size batches via `ntile` over a
    * range-partitioned sort — the planner samples boundaries, so no global
    * single-partition pass. Batch sizes are ±1 of each other rather than
    * exactly `size`. */
  def batchByRange(df: DataFrame, orderKey: Column, numBatches: Int): DataFrame =
    df.withColumn("batch_num",
      ntile(numBatches).over(Window.orderBy(orderKey)).cast("long"))
}
