package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, DotProduct, L2Distance, NfcNormalize, RollingPolynomialHash, SignProject, SortedLongIntersectCount, StripAccents}

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
    ext.injectFunction((FunctionIdentifier("l2_distance"),
      info("l2_distance", "l2_distance(array<float>, array<float>) - Euclidean distance"),
      (children: Seq[Expression]) => L2Distance(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(string) - Unicode NFC normalization"),
      (children: Seq[Expression]) => NfcNormalize(children(0))))
    ext.injectFunction((FunctionIdentifier("strip_accents"),
      info("strip_accents", "strip_accents(string) - NFD + combining-mark strip"),
      (children: Seq[Expression]) => StripAccents(children(0))))
    ext.injectFunction((FunctionIdentifier("rolling_token_hash"),
      info("rolling_token_hash",
        "rolling_token_hash(array<string>) - order-sensitive Karp-Rabin fingerprint"),
      (children: Seq[Expression]) => RollingPolynomialHash(children(0))))
    ext.injectFunction((FunctionIdentifier("sign_project"),
      info("sign_project",
        "sign_project(array<float>, dim, out_dim) - JL +/-1 sign projection (dims must be literals)"),
      (children: Seq[Expression]) => {
        def lit(i: Int): Int = {
          require(children(i).foldable,
            s"sign_project: argument ${i + 1} must be a literal integer")
          // integral types only: Number.intValue() would silently
          // truncate a 4.5 into dim=4 instead of erroring
          children(i).eval(null) match {
            case n: Int => n
            case n: Long if n.isValidInt => n.toInt
            case n: Short => n.toInt
            case n: Byte => n.toInt
            case other => throw new IllegalArgumentException(
              s"sign_project: argument ${i + 1} must be an integer, got $other")
          }
        }
        SignProject(children(0), lit(1), lit(2))
      }))
    ext.injectOptimizerRule(_ => graft.plans.IntersectCountRewrite)
  }
}
