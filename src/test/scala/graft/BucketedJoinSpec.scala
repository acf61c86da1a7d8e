package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins — the zero-shuffle path for repeated
  * fact-fact joins at scale (SURVEY.md §1.3 physical design): both sides
  * bucketed+sorted on the join key mean the sort-merge join reads
  * pre-partitioned, pre-sorted buckets with NO Exchange in the plan. On a
  * 100 TB fact table that is the difference between a network-bound and a
  * scan-bound join.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")

    orders.write.mode("overwrite").option("path", s"$wh/orders_b")
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed")
    customer.write.mode("overwrite").option("path", s"$wh/customer_b")
      .bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bucketed")
    try {
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed").hint("merge"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"),
        "bucketed-on-key join must not shuffle:\n" + plan.take(1500))
      assert(joined.count() === orders.join(customer,
        col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
