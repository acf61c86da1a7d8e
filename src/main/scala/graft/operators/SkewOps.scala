package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §7.4.8 scale posture).
  *
  * Spark 4's AQE already splits skewed SORT-MERGE join partitions at
  * runtime; these operators cover the cases AQE does not: broadcast-free
  * joins against a replicable right side, and single-hot-key aggregations
  * where one reducer would otherwise receive an entire key's rows.
  * At 100 TB a single hot key (e.g. the "unknown" user, the empty
  * document) routinely carries 1-10% of all rows — without salting that is
  * one straggler task pinning the whole stage.
  */
object SkewOps {

  /** Salted equi-join: the large (skewed) side gets a deterministic salt in
    * [0, buckets); the small side is replicated across every salt value.
    * Same result as `large.join(small, key)`, but a hot key's rows spread
    * over `buckets` reducers. Right side grows x buckets — keep it the
    * dimension side. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    // Salt must be uniform per-row but NOT depend on the join key alone
    // (that would re-concentrate the hot key); hash the whole row.
    val salt = pmod(xxhash64(large.columns.toIndexedSeq.map(col): _*), lit(buckets))
    val l = large.withColumn("__salt", salt)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<bigint>")))
    l.join(s, l(key) === s(key) && l("__salt") === s("__salt"), joinType)
      .drop(s(key)).drop("__salt")
  }

  /** Key-skew diagnostics — measure BEFORE you salt: the top-k heaviest
    * keys with their share of all rows and their skew ratio (count ÷ the
    * uniform per-key average). A skew_ratio of 40 on the top key says one
    * reducer would carry 40 keys' worth of work — the signal that a join
    * or aggregation on this key needs [[saltedJoin]]/[[twoPhaseSum]] or
    * AQE skew splitting. One aggregation on the key + a distributed
    * top-k (TakeOrderedAndProject — no single-task global sort) + a
    * one-row broadcast of the totals. Exact counts; shares are raw
    * quotients of exact integers. */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds the totals AND the top-k: one scan of df
    val totals = counts.agg(sum(col("cnt")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col(keyCol), col("cnt"), col("total_rows").cast("long").as("total_rows"),
        col("n_keys"),
        (col("cnt").cast("double") / col("total_rows").cast("double")).as("share"),
        (col("cnt").cast("double") * col("n_keys").cast("double") /
          col("total_rows").cast("double")).as("skew_ratio"))
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(topK)
  }

  /** Two-phase (salted) aggregation for algebraic aggregates: partial
    * aggregate on (key, salt), then final aggregate on key. `partial` and
    * `merge` must form a commutative monoid per column (sum/count/min/max).
    * Spark's own hash aggregate already does map-side partials; this adds a
    * REDUCER-side split for keys too hot for one task. */
  def twoPhaseSum(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
                  buckets: Int): DataFrame = {
    val salt = pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(buckets))
    val partials = sumCols.map(c => sum(col(c)).as(s"__s_$c"))
    val partial = df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__n"), partials: _*)
    val finals = sumCols.map(c => sum(col(s"__s_$c")).as(s"sum_$c"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"), finals: _*)
  }

  /** Gini coefficient of a non-negative integer measure across keys,
    * per group — the concentration summary behind "is this mixture
    * dominated by a few sources/keys" (0 = perfectly even, →1 = one key
    * owns everything). Exact rank formulation over the PER-KEY rollup
    * (the window sorts #keys rows, never raw rows):
    *
    *   G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx),  x sorted asc, i = 1..n
    *
    * Sums accumulate in DECIMAL (a BIGINT Σ i·x wraps silently at
    * warehouse scale); the quotient rounds to 6dp (the q_agg9 transcend-
    * ental/ulp policy). `keyCol` breaks rank ties — it must be unique per
    * (group, value) row or ranks, and G, are nondeterministic. Zero-total
    * groups yield null. */
  def giniByGroup(df: DataFrame, groupCol: String, keyCol: String,
                  valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol).asc, col(keyCol).asc)
    val xd = col(valueCol).cast("long").cast("decimal(28,0)")
    // Null measures are excluded BEFORE ranking (ADVICE r7): sum() skips
    // them but count/row_number would not, silently skewing n and the
    // ranks i — a null row is "no observation", not a zero.
    val ranked = df
      .select(col(groupCol), col(keyCol), col(valueCol))
      .where(col(valueCol).isNotNull)
      .withColumn("__i", row_number().over(w).cast("decimal(10,0)"))
    ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_keys"),
        sum(xd).as("__s"), sum(col("__i") * xd).as("__a"))
      .select(col(groupCol), col("n_keys"),
        when(col("__s") > 0, round(
          (lit(2) * col("__a") - (col("n_keys") + 1) * col("__s")).cast("double") /
            (col("n_keys") * col("__s")).cast("double"), 6))
          .as("gini"))
  }
}
