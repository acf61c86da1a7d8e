package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The injected optimizer rule: declarative sorted-distinct intersect
  * counts silently become the fused codegen expression — and ONLY when
  * every soundness precondition is provable from the plan. */
class IntersectCountRewriteSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed (a local Seq would be constant-folded to a
  // LocalRelation before the plan can be observed)
  private def docs = graft.Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text").as("t1"),
      reverse(col("text")).as("t2"))

  // non-null long arrays (xxhash64 is non-nullable => containsNull=false)
  private def hashed(c: String) =
    transform(split(col(c), " "), s => xxhash64(s))

  test("declarative pattern is rewritten to sorted_long_intersect_count") {
    val df = docs.select(col("doc_id"),
      size(array_intersect(
        sort_array(array_distinct(hashed("t1"))),
        sort_array(array_distinct(hashed("t2"))))).as("n"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("sorted_long_intersect_count"), opt)
    assert(!opt.contains("array_intersect"), opt)
    // values match the generic (un-rewritten) computation
    val generic = docs.select(col("doc_id"),
      size(array_intersect(array_distinct(hashed("t1")),
        array_distinct(hashed("t2")))).as("n"))
    assert(df.orderBy("doc_id").as[(Long, Int)].collect().toSeq ===
      generic.orderBy("doc_id").as[(Long, Int)].collect().toSeq)
    // self-intersect sanity: |distinct(x) ∩ distinct(x)| = |distinct(x)|
    val self = docs.select(
      size(array_intersect(
        sort_array(array_distinct(hashed("t1"))),
        sort_array(array_distinct(hashed("t1"))))).as("n"),
      size(array_distinct(hashed("t1"))).as("m"))
    assert(self.where(col("n") =!= col("m")).count() === 0)
  }

  test("no rewrite without the provable-sorted-distinct shape") {
    // missing array_distinct => duplicates possible => counts could differ
    val noDistinct = docs.select(
      size(array_intersect(sort_array(hashed("t1")), sort_array(hashed("t2")))))
    assert(!noDistinct.queryExecution.optimizedPlan.toString
      .contains("sorted_long_intersect_count"))
    // string elements => wrong element type for the primitive merge
    val strings = docs.select(
      size(array_intersect(
        sort_array(array_distinct(split(col("t1"), " "))),
        sort_array(array_distinct(split(col("t2"), " "))))))
    assert(!strings.queryExecution.optimizedPlan.toString
      .contains("sorted_long_intersect_count"))
  }
}
