package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StockPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def writeSymbolsCsv(): String = {
    val f = Files.createTempDirectory("graft_sym").resolve("symbols.csv")
    Files.writeString(f,
      """Symbol,Company_Name,Sector,Data_Exising,History_Existing,IPO_Year,Country,Industry
        |AAPL,Apple Inc.,Technology,True,6225.0,1980,United States,Consumer Electronics
        |MSFT,Microsoft Corp,Technology,True,6225.0,1986,United States,Software
        |NOIPO,No Ipo Corp,Finance,True,6225.0,,United States,Banks
        |""".stripMargin)
    f.toString
  }

  test("end-to-end: ingest -> synth -> validate -> screen -> partitioned sink") {
    val out = Files.createTempDirectory("graft_pipe").toString
    val res = StockPipeline.run(spark, writeSymbolsCsv(), out,
      startDate = "2023-12-15", days = 40)

    // symbol ingest: typed nullable casts (R1/R13)
    val syms = res.symbols.orderBy("Symbol")
      .select("Symbol", "data_existing", "ipo_year")
      .as[(String, Boolean, Option[Int])].collect()
    assert(syms === Seq(("AAPL", true, Some(1980)), ("MSFT", true, Some(1986)),
      ("NOIPO", true, None)))

    // all three symbols have identical synthetic history -> all survive the screen
    val perSym = res.prices.groupBy("company").count().as[(String, Long)].collect().toMap
    assert(perSym.keySet === Set("AAPL", "MSFT", "NOIPO"))
    assert(perSym.values.toSet.size === 1, "equal trading-day counts")

    // quarantine is empty on well-formed synthetic data
    assert(res.quarantined.count() === 0)

    // Hive layout spans the year boundary: company=/year=2023 and 2024
    val aapl23 = new java.io.File(s"$out/company=AAPL/year=2023")
    val aapl24 = new java.io.File(s"$out/company=AAPL/year=2024")
    assert(aapl23.isDirectory && aapl24.isDirectory)

    // round-trip: partition columns recovered, weekends excluded
    val back = spark.read.parquet(out)
    assert(back.count() === res.prices.count())
    assert(back.select(weekday(col("Date"))).distinct()
      .as[Int].collect().forall(d => d >= 0 && d <= 4))

    // manifest shadow matches the physical layout grain
    val m = res.manifest.as[(String, Int, Long)].collect()
    assert(m.map(_._1).toSet === Set("AAPL", "MSFT", "NOIPO"))
    assert(m.forall(_._3 > 0))
  }

  test("screening drops symbols with incomplete history") {
    val prices = Seq(
      ("FULL", 1), ("FULL", 2), ("FULL", 3),
      ("ALSO", 1), ("ALSO", 2), ("ALSO", 3),
      ("PART", 1)
    ).toDF("company", "d")
    val kept = StockPipeline.screenFullHistory(prices).as[String].collect().sorted
    assert(kept === Seq("ALSO", "FULL"))
  }

  test("validation quarantines malformed rows with a reason") {
    val df = Seq(
      ("A", 10.0, 12.0, 9.0, 11.0, 100L),
      ("B", 10.0, 8.0, 9.0, 11.0, 100L),  // high < low
      ("C", 10.0, 12.0, 9.0, 11.0, 0L)    // bad volume
    ).toDF("company", "Open", "High", "Low", "Close", "Volume")
    val (clean, quarantined) = StockPipeline.validateSplit(df)
    assert(clean.select("company").as[String].collect().toSeq === Seq("A"))
    val reasons = quarantined.select("company", "quarantine_reason")
      .as[(String, String)].collect().toMap
    assert(reasons === Map("B" -> "high<low", "C" -> "bad volume"))
  }
}
