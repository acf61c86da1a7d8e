package graft

import org.apache.spark.sql.functions._

/** Runtime skew handling: AQE must split a pathologically hot join key's
  * partition into parallel subtasks (the complement to SkewOps' manual
  * salting — SURVEY.md §4.2 "AQE skew-join splitting on by default").
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE marks and splits the skewed sort-merge join partition") {
    val confs = Seq(
      "spark.sql.shuffle.partitions" -> "8", // need a real median to beat
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of left rows share key 7 — one reducer would get ~180k rows
      val left = spark.range(0, 200000).select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val right = spark.range(0, 1000).select(col("id").as("k"), col("id").as("rv"))
      val joined = left.join(right.hint("merge"), "k")
      // materialize THIS QueryExecution (count() would spawn its own)
      // 180k hot-key matches + ids {0,10,...,990} hitting the 1k right keys
      assert(joined.collect().length === 180100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        "expected AQE to flag the skewed join:\n" + plan.take(1200))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
