package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for the NAMED queries to individual files
  * — the per-change plan evidence for optimization rounds (ExplainAll's
  * whole-surface sweep is the round-close artifact; this is the focused
  * A/B probe). Usage:
  * `sbt "runMain graft.ExplainSome <outDir> <suffix> <query> [query...]"`
  * writes `<outDir>/<query>_<suffix>.txt` per query, planned at sf0.001
  * (plan SHAPE is scale-invariant here; timings come from graft.Bench).
  */
object ExplainSome {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainSome <outDir> <suffix> <query>...")
    val outDir = args(0); val suffix = args(1); val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val plan = try {
        fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      } catch { case e: Throwable => s"FAILED TO PLAN: ${e.getMessage}" }
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
