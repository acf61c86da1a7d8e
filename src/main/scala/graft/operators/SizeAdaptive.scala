package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-adaptive execution picks shared by the iterative operators
  * (r16 — ADVICE r15: the ~100 B/row broadcast-threshold derivation was
  * duplicated between GraphOps and NearDup.connectedComponents and could
  * silently drift; one definition now serves every call site).
  *
  * The iterative loops run over localCheckpointed frames that report NO
  * size statistics, so the planner's own broadcast decision can never
  * fire on them. These helpers re-derive the planner's decision from a
  * row count (or proven row-count bound) the caller already tracks, and
  * scale the same way the planner does: a billion-row side falls back to
  * the shuffle path exactly as `autoBroadcastJoinThreshold` would make it.
  */
private[operators] object SizeAdaptive {

  /** Max row count [[maybeBroadcast]] will broadcast for this session:
    * autoBroadcastJoinThreshold over the ~100 B/row a built hash relation
    * costs; 0 when broadcasting is disabled. */
  def broadcastRowCap(df: DataFrame): Long = {
    val conf = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val thr =
      if (conf.trim.startsWith("-")) -1L
      else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(conf)
    if (thr > 0) thr / 100L else 0L
  }

  /** Broadcast `df` when a conservative estimate of its built hash
    * relation (~100 B/row) fits under the session's
    * autoBroadcastJoinThreshold; otherwise return it unchanged (the
    * shuffle path). `rows` must be a proven upper bound on `df`'s row
    * count. */
  def maybeBroadcast(df: DataFrame, rows: Long): DataFrame =
    if (rows <= broadcastRowCap(df)) broadcast(df) else df
}
