package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("report computes all metrics in one pass, long-form") {
    val df = Seq(
      (1L, Some("a"), 10.0),
      (2L, None, -1.0),
      (2L, Some("c"), 0.0),
      (3L, Some("zz"), 5.0)
    ).toDF("id", "cat", "v")
    val rep = DataQuality.report(df, Seq(
      "n_rows" -> count(lit(1)),
      "null_cat" -> DataQuality.nullCount(col("cat")),
      "dup_id" -> DataQuality.duplicateKeys(col("id")),
      "nonpositive_v" -> DataQuality.violations(col("v") <= 0),
      "bad_cat" -> DataQuality.violations(!col("cat").isin("a", "b", "c"))))
      .as[(String, Double)].collect().toMap
    assert(rep === Map(
      "n_rows" -> 4.0, "null_cat" -> 1.0, "dup_id" -> 1.0,
      "nonpositive_v" -> 2.0, "bad_cat" -> 1.0))
  }

  test("report is a single aggregation: exactly one Aggregate pair, no joins") {
    val df = Seq((1L, 2.0)).toDF("id", "v")
    val plan = DataQuality.report(df, Seq(
      "n_rows" -> count(lit(1)),
      "nonpositive_v" -> DataQuality.violations(col("v") <= 0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in plan:\n$plan")
  }
}
