package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.StockPipeline

/** The graft-ohlcv DataSourceV2 (reference R5's acquisition as a real
  * Spark source): bitwise-equal to the expression generator, plans as a
  * BatchScan over symbol-chunk partitions, prunes columns in the reader. */
class OhlcvSourceSpec extends SparkSpec {
  import spark.implicits._

  test("graft-ohlcv scan is row-identical to the expression generator") {
    val syms = Seq("AAPL", "MSFT", "GOOG")
    val viaSource = StockPipeline.acquirePrices(spark, syms, "2023-12-15", 40)
    val viaExpr = StockPipeline.syntheticPrices(spark, syms.toDF("Symbol"),
      "2023-12-15", 40)
    assert(viaSource.schema.map(f => (f.name, f.dataType)) ===
      viaExpr.schema.map(f => (f.name, f.dataType)))
    assert(viaSource.count() === viaExpr.count())
    assert(viaSource.exceptAll(viaExpr).count() === 0)
    assert(viaExpr.exceptAll(viaSource).count() === 0)
  }

  test("plan is a custom BatchScan; projection prunes to the reader") {
    val df = StockPipeline.acquirePrices(spark, Seq("AAA", "BBB"), "2024-01-01", 10)
      .select("company", "year")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BatchScan"), p)
    assert(p.contains("graft-ohlcv"), p)
    assert(!p.contains("Close"), "pruned column must not reach the scan:\n" + p)
    assert(df.distinct().count() === 2)
  }

  test("symbol chunks parallelize the scan; options control the span") {
    val df = StockPipeline.acquirePrices(spark, ('A' to 'P').map(c => s"SYM$c"),
      "2024-01-01", 7)
    assert(df.rdd.getNumPartitions === 8)
    // 7 calendar days from Mon 2024-01-01 = 5 trading days per symbol
    assert(df.count() === 16L * 5)
  }

  test("runFromSource: pipeline over the source matches run over the generator") {
    val csv = {
      val f = Files.createTempDirectory("graft_sym_src").resolve("symbols.csv")
      Files.writeString(f,
        """Symbol,Company_Name,Sector,Data_Exising,History_Existing,IPO_Year,Country,Industry
          |AAPL,Apple Inc.,Technology,True,6225.0,1980,United States,Consumer Electronics
          |MSFT,Microsoft Corp,Technology,True,6225.0,1986,United States,Software
          |""".stripMargin)
      f.toString
    }
    val outA = Files.createTempDirectory("graft_pipe_src").toString
    val outB = Files.createTempDirectory("graft_pipe_gen").toString
    val fromSource = StockPipeline.runFromSource(spark, csv, outA,
      startDate = "2024-01-01", days = 20)
    val fromGen = StockPipeline.run(spark, csv, outB,
      startDate = "2024-01-01", days = 20)
    assert(fromSource.prices.count() === fromGen.prices.count())
    assert(fromSource.prices.exceptAll(fromGen.prices).count() === 0)
  }
}
