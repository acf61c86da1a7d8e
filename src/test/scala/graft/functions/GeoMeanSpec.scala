package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GeoMeanSpec extends SparkSpec {
  import spark.implicits._

  test("geometric mean matches exp(mean(ln)) and handles groups") {
    val gm = udaf(GeoMean.agg)
    val df = Seq(("a", 2.0), ("a", 8.0), ("b", 5.0)).toDF("g", "v")
    val out = df.groupBy("g").agg(gm(col("v")).as("gmv"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(out("a") - 4.0) < 1e-12) // sqrt(2*8)
    assert(math.abs(out("b") - 5.0) < 1e-12)
  }

  test("partial aggregation: result is partitioning-invariant") {
    val gm = udaf(GeoMean.agg)
    val vals = (1 to 1000).map(_.toDouble)
    val one = vals.toDF("v").coalesce(1).agg(gm(col("v"))).as[Double].head()
    val many = vals.toDF("v").repartition(7).agg(gm(col("v"))).as[Double].head()
    assert(math.abs(one - many) < 1e-9)
  }

  test("map/array/json scalar semantics the oracle can't see") {
    // q_map1's shape: build map, size, lookup incl. missing key (null, not error)
    val df = Seq((1, Map("a" -> 1L, "b" -> 2L))).toDF("id", "m")
    val r = df.select(size(col("m")), try_element_at(col("m"), lit("b")),
      try_element_at(col("m"), lit("zz"))).head()
    assert(r.getInt(0) === 2)
    assert(r.getLong(1) === 2L)
    assert(r.isNullAt(2))
  }
}
