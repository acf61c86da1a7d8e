package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch
import graft.{SparkSpec, Tables}

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val toks = Tables.load(spark, sf, "documents")
    .select(col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
    .localCheckpoint()

  private val probes = Seq("and", "der", "el", "of", "the")

  test("merged per-group sketches estimate exactly like one global sketch") {
    val grouped = SketchOps.cmsEstimates(toks, "tok", "lang", probes)
      .as[(String, Long)].collect().toMap
    val global = toks.groupBy(lit(1))
      .agg(expr("count_min_sketch(tok, 0.001d, 0.99d, 42)").as("sk"))
      .collect().head.getAs[Array[Byte]]("sk")
    val whole = CountMinSketch.readFrom(global)
    probes.foreach { p =>
      assert(grouped(p) === whole.estimateCount(p), s"merge must be lossless for $p")
    }
  }

  test("estimates are one-sided: >= exact, overshoot bounded by eps * N") {
    val est = SketchOps.cmsEstimates(toks, "tok", "lang", probes)
      .as[(String, Long)].collect().toMap
    val exact = toks.where(col("tok").isin(probes: _*))
      .groupBy("tok").count().as[(String, Long)].collect().toMap
    val n = toks.count()
    probes.foreach { p =>
      val t = exact.getOrElse(p, 0L)
      assert(est(p) >= t, s"$p: CMS can never undercount ($t vs ${est(p)})")
      assert(est(p) <= t + (0.001 * n).toLong + 1,
        s"$p overshoot beyond eps*N: est ${est(p)}, exact $t, n $n")
    }
    assert(probes.exists(p => exact.getOrElse(p, 0L) > 0), "probes must hit the corpus")
  }
}
