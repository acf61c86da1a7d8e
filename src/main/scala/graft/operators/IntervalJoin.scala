package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join: pairs (a, b) sharing an equality key whose time
  * ranges intersect — campaigns x sessions, outages x requests, labels x
  * spans. Spark has no native interval join; the naive form
  * (`a.join(b, cond)` with only inequalities) plans a BroadcastNestedLoop /
  * cartesian per key — quadratic, the classic scale-killer.
  *
  * This is the standard BUCKETIZED shape (what Flink's interval join and
  * the range-join optimizations in warehouse engines do): explode each
  * interval into the fixed-width time buckets it spans, equi-join on
  * (key, bucket), then keep a pair only in ONE canonical bucket —
  * `max(bucketOf(a.start), bucketOf(b.start))` — so overlaps are emitted
  * exactly once WITHOUT a distinct (no second shuffle). Candidate volume is
  * sum over (key, bucket) of |A||B| — bounded by choosing `bucketWidth`
  * near the typical interval span, exactly the Flink guidance.
  *
  * All bounds are long microseconds (cast timestamps with `unix_micros`).
  * Intervals are CLOSED: [s1,e1] overlaps [s2,e2] iff s1<=e2 && s2<=e1.
  */
object IntervalJoin {

  /** floor(us / width) — exact for non-negative epochs: the true ratio of
    * a BIGINT by `width` is never within a half-ulp of a wrong integer
    * (distance >= 1/width > ulp(2^53/width)/2), so the correctly rounded
    * double divide + truncation IS floor division here. */
  private def bucketOf(us: Column, width: Long): Column =
    floor(us.cast("double") / lit(width.toDouble)).cast("long")

  /** Overlap-join `a` and `b`. `aStart`/`aEnd`/`bStart`/`bEnd` name long
    * microsecond columns; `key` names the equality column present in both
    * (pass a constant column upstream for a pure time join — and accept
    * that all rows then collide in each time bucket). Returns a's columns
    * ++ b's columns plus `overlap_us`.
    *
    * INVERTED intervals (end < start — bad upstream data) are dropped, not
    * joined: Spark's `sequence(lo, hi)` silently generates a DESCENDING
    * range when hi < lo, which would explode an inverted interval into
    * wrong candidate buckets (the same sequence pitfall the <2-token guard
    * in `TextOps.bigrams` exists for). The `when` guard yields NULL for
    * such rows and `explode` emits nothing — a row that can't overlap
    * anything under the closed-interval definition produces no pairs. */
  def overlapJoin(a: DataFrame, b: DataFrame, key: String,
                  aStart: String, aEnd: String, bStart: String, bEnd: String,
                  bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    def buckets(s: String, e: String): Column =
      when(col(s) <= col(e),
        sequence(bucketOf(col(s), bucketWidth), bucketOf(col(e), bucketWidth)))
    val ae = a.withColumn("__bkt", explode(buckets(aStart, aEnd)))
    val be = b.withColumn("__bkt", explode(buckets(bStart, bEnd)))
    ae.join(be, Seq(key, "__bkt"))
      .where(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
        col("__bkt") === greatest(bucketOf(col(aStart), bucketWidth),
          bucketOf(col(bStart), bucketWidth)))
      .drop("__bkt")
      .withColumn("overlap_us",
        least(col(aEnd), col(bEnd)) - greatest(col(aStart), col(bStart)))
  }

  /** Interval-union coverage per key (round 10) — the sweep-line
    * gaps-and-islands rollup: merge each key's CLOSED integer intervals
    * [start, end] wherever they overlap (start ≤ some earlier interval's
    * end; merely ADJACENT intervals stay separate islands), then report
    * (n_intervals, n_islands, covered_units, span_units). This is the
    * "how much of the timeline is actually covered" statistic
    * (in-transit days, on-call coverage, valid-data spans) that a plain
    * sum of durations double-counts.
    *
    * The sweep is two windows on ONE key partitioning: a new island
    * opens where start > max(end) over all EARLIER rows in (start,
    * tiebreak) order (ties in start can never open an island — an
    * equal-start row's span is reachable from the first), and the island
    * id is the running count of opens. Exact integers throughout;
    * covered counts BOTH endpoints (closed-interval day semantics). */
  def coverage(df: DataFrame, keyCols: Seq[String], startCol: String,
               endCol: String, tiebreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = (col("__s") +: (col("__e") +: tiebreak.map(col))).map(_.asc)
    val wPrev = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(keyCols.map(col) ++ Seq(col(startCol).cast("long").as("__s"),
        col(endCol).cast("long").as("__e")) ++ tiebreak.map(col): _*)
      .withColumn("__open",
        when(col("__s") > coalesce(max(col("__e")).over(wPrev),
          col("__s") - 1), 1L).otherwise(0L))
      .withColumn("__island", sum(col("__open")).over(wRun))
      .groupBy(keyCols.map(col) :+ col("__island"): _*)
      .agg(min(col("__s")).as("__is"), max(col("__e")).as("__ie"),
        count(lit(1)).as("__n"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("__ie") - col("__is") + 1).as("covered_units"),
        (max(col("__ie")) - min(col("__is")) + 1).as("span_units"))
  }
}
