package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch frequency estimation — the mergeable heavy-hitters
  * sketch next to HLL (q_agg14) and GK quantiles (q_agg13) in the
  * mergeable-summary family: fixed-size (eps x confidence sized) counter
  * arrays that estimate any key's frequency with one-sided error
  * (estimate >= truth, overshoot <= eps * N with the configured
  * probability).
  *
  * Scale shape: one map-side-combined aggregation builds a sketch PER
  * GROUP (`count_min_sketch` is codegen-registered and merges
  * associatively inside the agg); only the finished ~KB sketches leave
  * the cluster. Merging group sketches and probing keys is driver work
  * proportional to sketch bytes, never data rows — the same
  * consume-the-summary step a BI layer performs. */
object SketchOps {

  /** Estimated frequencies of `probes` from per-`group` count-min
    * sketches over `keyExprSql` (a SQL expression over `df`'s columns),
    * merged across groups. Returns (probe, est_n) — deterministic for a
    * fixed seed.
    *
    * The key is cast to STRING at build time so the sketch's hash space
    * always matches the String `probes` (a bigint key sketched raw would
    * hash differently than its string probe and silently estimate 0);
    * an empty input yields an empty sketch, so every probe estimates 0. */
  def cmsEstimates(df: DataFrame, keyExprSql: String, groupCol: String,
                   probes: Seq[String], eps: Double = 0.001,
                   confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sketches = df.groupBy(col(groupCol))
      .agg(expr(s"count_min_sketch(CAST(($keyExprSql) AS STRING), ${eps}d, ${confidence}d, $seed)").as("sk"))
      .collect()
    val merged = sketches.map { r: Row =>
      CountMinSketch.readFrom(r.getAs[Array[Byte]]("sk"))
    }.reduceOption((a, b) => a.mergeInPlace(b))
      .getOrElse(CountMinSketch.create(eps, confidence, seed))
    probes.map(p => (p, merged.estimateCount(p))).toDF("probe", "est_n")
  }
}
