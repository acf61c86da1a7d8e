package graft.streaming

import org.apache.spark.sql.DataFrame

/** Guard for the two incremental-store layouts every streaming operator
  * here supports: per-batch-id (`dir/batch=<id>/...`, replay-idempotent
  * overwrite) vs one-shot append (data files at the store root). The two
  * MUST NOT mix on one directory — a root-level append next to a
  * `batch=` subdirectory leaves parquet leaves at two depths and
  * partition discovery rejects the store permanently ("Conflicting
  * directory structures"). A store created in one mode therefore pins
  * that mode, and a call in the other mode fails fast HERE, before any
  * corrupting write.
  */
private[streaming] object StoreLayout {

  /** `all` = the freshly-read existing store; throws when the caller's
    * `batchId` mode disagrees with the layout `all` was written in. */
  def check(all: DataFrame, dir: String, batchId: Option[Long]): Unit = {
    val hasBatch = all.columns.contains("batch")
    require(hasBatch == batchId.isDefined,
      s"store layout mismatch at $dir: the existing store is " +
        (if (hasBatch) "per-batch-id (pass a batchId to every call)"
         else "one-shot append (pass batchId = None)") +
        "; mixing the layouts would corrupt the store's directory structure")
  }
}
