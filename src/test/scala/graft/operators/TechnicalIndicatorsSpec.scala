package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TechnicalIndicatorsSpec extends SparkSpec {
  import spark.implicits._

  test("EMA matches the sequential reference per key and is partition-invariant") {
    val vals = Seq(10.0, 12.0, 11.0, 15.0, 14.0, 13.0)
    val rows = for {
      k <- Seq(1L, 2L); (v, i) <- vals.zipWithIndex
    } yield (k, i.toLong, v + k) // distinct series per key
    val df = rows.toDF("k", "ord", "v")
    for (parts <- Seq(1, 3)) {
      val out = TechnicalIndicators.ema(df.repartition(parts), "k", "ord", "v", 0.3)
        .orderBy("k", "ord").select("k", "ema").as[(Long, Double)].collect()
      for (k <- Seq(1L, 2L)) {
        val expected = TechnicalIndicators.emaReference(vals.map(_ + k), 0.3)
        val got = out.filter(_._1 == k).map(_._2).toSeq
        got.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
      }
    }
  }

  test("windowed exact mean/sd agrees with direct computation") {
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 12.0), (1L, 3L, 14.0)).toDF("k", "o", "v")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("o")
      .rowsBetween(Long.MinValue, 0)
    val (mean, sd) = TechnicalIndicators.meanSd(col("v"), w)
    val last = df.select(mean.as("m"), sd.as("s")).orderBy(desc("m")).head()
    assert(math.abs(last.getDouble(0) - 12.0) < 1e-12)
    assert(math.abs(last.getDouble(1) - 2.0) < 1e-12) // sd of 10,12,14
  }
}
