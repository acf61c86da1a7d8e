package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge._
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}

/** Bloom-filter join pruning — the big-big join pattern where neither side
  * broadcasts: a shuffle (sort-merge) join must shuffle the ENTIRE fact
  * side, even if only a sliver of it matches the dimension's keys. A Bloom
  * filter over the build side's keys is a few MB regardless of fact size;
  * probing it BEFORE the fact's Exchange cuts the shuffle to (matching
  * rows + the fp rate) at scan speed. This is exactly Spark's own runtime
  * row-level filtering shape (`InjectRuntimeFilter`), expressed explicitly
  * so it also fires when the optimizer's injection heuristics (creation-
  * side thresholds, selective-filter detection) decline — e.g. a dimension
  * that is small only AFTER an aggregation, or a curated key list.
  *
  * Built from the same internal expressions Spark's injection uses
  * (`BloomFilterAggregate` / `BloomFilterMightContain`), so the probe is a
  * codegen'd scan filter and the build is one aggregation of the dim —
  * never a driver-side collect.
  */
object BloomJoin {

  /** Optimal bit count for `n` items at false-positive rate `fpp`. */
  private def optimalBits(n: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong.max(64L)
  }

  /** A Column that is true when `probeKey` MIGHT be among `buildKeys`
    * (never false for a present key; false positives at ~fpp). The build
    * side runs as a scalar subquery: one aggregation, its ~MB binary
    * result shipped to every probe task. */
  def mightContain(build: DataFrame, buildKey: Column, probeKey: Column,
                   expectedItems: Long, fpp: Double = 0.03): Column = {
    val agg = columnOf(new BloomFilterAggregate(
      new XxHash64(Seq(expressionOf(buildKey))),
      Literal(expectedItems), Literal(optimalBits(expectedItems, fpp)))
      .toAggregateExpression())
    val bloomPlan = build.agg(agg.as("__bloom")).queryExecution.analyzed
    columnOf(new BloomFilterMightContain(
      ScalarSubquery(bloomPlan),
      new XxHash64(Seq(expressionOf(probeKey)))))
  }

  /** Inner join with the fact side bloom-pruned before its shuffle. The
    * bloom's false positives are eliminated by the exact join, so the
    * result EQUALS the plain join (oracle-checkable); only the shuffled
    * volume changes. `merge` hint models the at-scale plan: at 100 TB
    * neither side broadcasts, and pruning before the Exchange is the
    * entire point. */
  def prunedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 expectedItems: Long, fpp: Double = 0.03): DataFrame =
    fact.where(mightContain(dim, col(key), col(key), expectedItems, fpp))
      .join(dim.hint("merge"), key)
}
