package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, DotProduct, SortedLongIntersectCount}

/** SparkSessionExtensions entry point (SURVEY.md §3.3): registers the
  * engine's custom Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT cosine_similarity(a, b) ...")` works next to the
  * Column API, and installs the optimizer rewrite that turns the
  * declarative sorted-distinct intersect-count pattern into the fused
  * codegen expression (graft.plans.IntersectCountRewrite). Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(array<float>, array<float>) - cosine similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(array<float|double|tinyint>, array<float|double|tinyint>) - in-order dot product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("sorted_long_intersect_count"),
      info("sorted_long_intersect_count",
        "sorted_long_intersect_count(array<bigint>, array<bigint>) - |A intersect B| of sorted arrays"),
      (children: Seq[Expression]) => SortedLongIntersectCount(children(0), children(1))))
    ext.injectOptimizerRule(_ => graft.plans.IntersectCountRewrite)
  }
}
