package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** In-plan row-bound guards for the repo's DELIBERATE single-partition
  * passes (round-10 hardening, VERDICT r9 #8).
  *
  * A handful of operators run a global (unpartitioned) window on purpose:
  * their inputs are dimension-sized BY INVARIANT — a symbol list, a
  * per-source mixture table, a row-capped sample, a top-k survivor set.
  * Each such site is one refactor away from silently sorting an unbounded
  * fact table through a single task at 100 TB. The guard makes the
  * invariant LOCAL and RUNTIME-ENFORCED: the row count rides the same
  * single-partition window the operator already pays for (a count over
  * the unbounded-both frame of the SAME spec adds no exchange), and the
  * job fails fast with the site name instead of hanging on a one-task
  * sort.
  *
  * The companion source sweep (`GlobalWindowSweepSpec`) whitelists
  * exactly the sites allowed to build global windows, so an eighth site
  * cannot appear without updating both the whitelist and (for operator
  * sites) wiring a guard.
  */
object RowBound {

  /** Red line for a "dimension-scale" single-task pass: 10M rows through
    * one task (~hundreds of MB sorted in one thread) is where a deliberate
    * global window stops being free and the operator's fact-scale sibling
    * (batchByRange / boundariesFromSample+assignByBoundaries) is the
    * right tool. */
  val DimensionScaleRows: Long = 10000000L

  /** Wrap a window-derived column so that evaluating it on a frame larger
    * than `bound` rows raises with `site` in the message. `spec` MUST be
    * the same window spec (partitioning + ordering) the wrapped column
    * uses — the count then lands in the same Window operator and the
    * guard costs no extra exchange. */
  def guarded(c: Column, spec: WindowSpec, bound: Long, site: String): Column = {
    val n = count(lit(1)).over(
      spec.rowsBetween(Long.MinValue, Long.MaxValue))
    when(n > bound, raise_error(concat(
        lit(s"$site: global-window input has "), n.cast("string"),
        lit(s" rows (bound $bound) — use the operator's fact-scale path"))))
      .otherwise(c)
  }
}
