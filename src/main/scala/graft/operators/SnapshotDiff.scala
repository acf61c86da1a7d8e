package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — diff two versions of the same keyed table into
  * added / removed / changed rows. The reference re-downloads each symbol's
  * full history every run and overwrites the sink
  * (`data_collection/dags/stock_data_airflow_local_aws_s3.py:67-92`); at
  * 100 TB the viable pattern is the inverse: diff today's snapshot against
  * yesterday's and ship only the delta (this operator), then apply it with
  * [[graft.streaming.IncrementalUpdate]]'s merge.
  *
  * Shape: ONE full-outer sort-merge join on the key — both sides shuffle
  * once on the same key, no window, no driver state. `changed` compares the
  * tracked columns null-safely (`<=>`), so null-to-value edits are real
  * changes and null==null is not.
  */
object SnapshotDiff {

  /** Returns key columns + `change_type` in ('added','removed','changed')
    * plus old_/new_ copies of the tracked columns. Unchanged rows are
    * dropped (the delta is the point — at scale it is orders of magnitude
    * smaller than either snapshot). `added` = in `next` only; `removed` =
    * in `prev` only. */
  def diff(prev: DataFrame, next: DataFrame, keys: Seq[String],
           tracked: Seq[String]): DataFrame = {
    require(keys.nonEmpty && tracked.nonEmpty)
    val p = prev.select((keys ++ tracked).map(col): _*)
      .withColumnsRenamed(tracked.map(c => c -> s"old_$c").toMap)
    val n = next.select((keys ++ tracked).map(col): _*)
      .withColumnsRenamed(tracked.map(c => c -> s"new_$c").toMap)
    // Presence markers survive even when every tracked column is null.
    val pm = p.withColumn("__in_prev", lit(true))
    val nm = n.withColumn("__in_next", lit(true))
    val j = pm.join(nm, keys, "full_outer")
    val same = tracked.map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduce(_ && _)
    j.withColumn("change_type",
        when(col("__in_prev").isNull, lit("added"))
          .when(col("__in_next").isNull, lit("removed"))
          .when(!same, lit("changed")))
      .where(col("change_type").isNotNull)
      .drop("__in_prev", "__in_next")
  }
}
