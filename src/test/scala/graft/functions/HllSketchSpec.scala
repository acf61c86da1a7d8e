package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Mergeable HLL sketches (q_agg14): the property that makes sketches the
  * scale path for distinct counts — partial sketches over disjoint slices
  * union-merge to EXACTLY the sketch of the whole, so history never needs
  * a rescan when a new slice arrives.
  */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("union of per-month sketches estimates exactly like one whole-corpus sketch") {
    val ev = Tables.load(spark, sf, "events")
    val merged = ev
      .groupBy(date_trunc("month", col("ts")).as("m"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .as[Long].head()
    val whole = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .as[Long].head()
    assert(merged === whole, s"merge-of-parts $merged != whole-corpus $whole")
    val exact = ev.select(countDistinct(col("user_id"))).as[Long].head()
    val relErr = math.abs(merged - exact).toDouble / exact
    info(f"exact $exact, sketch $merged, rel err $relErr%.4f")
    assert(relErr < 0.05, f"sketch error $relErr%.4f exceeds 5%%")
  }
}
