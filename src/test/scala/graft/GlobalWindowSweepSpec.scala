package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._

/** Whitelist sweep over every GLOBAL-window construction site in the main
  * source tree (round 10, VERDICT r9 #8): a `Window.orderBy(...)` with no
  * partitioning (plans `Exchange SinglePartition`) or a
  * `Window.partitionBy(lit(1))` is a deliberate one-task pass that is only
  * safe under a row-bound invariant. This spec pins the EXACT set of
  * allowed sites, each of which carries either an in-plan runtime guard
  * (`graft.util.RowBound.guarded`) or a structural bound stated at the
  * site — so an eighth global window cannot appear without a conscious
  * whitelist edit here.
  */
class GlobalWindowSweepSpec extends SparkSpec {

  // file -> expected number of global-window constructions, with the bound
  // that justifies each (kept in lockstep with the site comments)
  private val whitelist: Map[String, Int] = Map(
    // guarded via RowBound.guarded (fails fast past DimensionScaleRows):
    "operators/Batching.scala" -> 1,   // withBatchNum (dimension lists)
    "operators/Binning.scala" -> 2,    // equiDepthBuckets + the row-capped sample ntile
    "operators/TradingCalendar.scala" -> 1, // sessionCalendar: one row per day
    "operators/Curation.scala" -> 4,   // waterfill ord+all, temperature all+remOrd (guards shared)
    // structurally bounded (bound stated at the site):
    "operators/Similarity.scala" -> 1, // withRecallAgainst: <= k result rows
    "queries/TextDedupQueries.scala" -> 1, // q_txt24: limit(50) upstream
    "queries/OpsQueries.scala" -> 1,   // q_sess7: one row per calendar day
    "queries/SimMmQueries.scala" -> 1  // q_sim14 rerank: limit(50) upstream
  )

  test("every global-window site is whitelisted and counted exactly") {
    val root = Paths.get("src/main/scala/graft")
    val global = raw"Window\s*\.\s*(orderBy|partitionBy\(lit\(1\)\))".r
    val found = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p =>
        val src = Files.readString(p)
        // count partitionBy(lit(1)) and bare Window.orderBy( — a
        // partitioned window is Window.partitionBy(<keys>).orderBy and
        // never matches `Window.orderBy` directly
        val n = global.findAllIn(src).length
        if (n == 0) None else Some(root.relativize(p).toString -> n)
      }.toMap
    assert(found === whitelist,
      s"global-window sites drifted:\nfound=$found\nwhitelist=$whitelist\n" +
        "a NEW site needs a row bound (RowBound.guarded or a structural " +
        "bound comment) AND a whitelist entry here")
  }

  test("no SQL-text global window outside oracle strings (expr/selectExpr gap)") {
    // The Scala sweep above only sees `Window.orderBy(` — a global window
    // smuggled in as SQL TEXT (expr("row_number() OVER (ORDER BY ...)"),
    // selectExpr, spark.sql) would plan the same Exchange SinglePartition
    // without tripping it. This sweep closes that gap: every
    // `OVER (ORDER BY` in the main tree must sit in a DuckDB ORACLE string
    // (stripMargin `|` continuation line — oracle SQL never executes in
    // Spark) or a comment; anything else is an unguarded Spark-side site.
    val root = Paths.get("src/main/scala/graft")
    val sqlGlobal = raw"(?i)OVER\s*\(\s*ORDER\s+BY".r.unanchored
    val offenders = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p =>
        Files.readAllLines(p).asScala.zipWithIndex.collect {
          case (line, i) if sqlGlobal.matches(line) &&
            !line.trim.startsWith("|") && !line.trim.startsWith("*") &&
            !line.trim.startsWith("//") =>
            s"${root.relativize(p)}:${i + 1}: ${line.trim.take(80)}"
        }
      }.toList
    assert(offenders.isEmpty,
      "SQL-text global window in Spark-side code (needs a RowBound guard " +
        s"or a structural bound + whitelist):\n${offenders.mkString("\n")}")
  }

  test("RowBound.guarded fails fast past the bound and is silent under it") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("x")
    val df = (1 to 100).map(_.toLong).toDF("x")
      .withColumn("rn", graft.util.RowBound.guarded(
        row_number().over(w).cast("long"), w, 1000L, "spec-site"))
    assert(df.agg(max("rn")).as[Long].head() === 100L)
    val tight = (1 to 100).map(_.toLong).toDF("x")
      .withColumn("rn", graft.util.RowBound.guarded(
        row_number().over(w).cast("long"), w, 99L, "spec-site"))
    val e = intercept[Exception] { tight.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("spec-site") && m.contains("100")),
      msgs(e).mkString(" | "))
  }

  test("the guard adds no exchange: count rides the operator's own window") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, s"s$i")).toDF("k", "v")
    val p = graft.operators.Batching.withBatchNum(df, "k", 3)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).length === 1, p.take(1500))
  }
}
