package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Drives `graft-ohlcv` with `transport=http` against a real loopback HTTP
  * server (JDK `com.sun.net.httpserver` — no egress): the exact reader a
  * live deployment configures, exercising the R6 retry/skip semantics the
  * reference implements with try/except-and-continue.
  */
class OhlcvHttpSourceSpec extends SparkSpec {

  private val csvFor = Map(
    "AAA" -> """Date,Open,High,Low,Close,Adj Close,Volume
               |2024-01-02,10.0,11.0,9.5,10.5,10.29,1000
               |2024-01-03,10.5,12.0,10.0,11.5,11.27,1500""".stripMargin,
    "BBB" -> """Date,Open,High,Low,Close,Adj Close,Volume
               |2024-01-02,20.0,21.0,19.5,20.5,20.09,2000""".stripMargin,
    "FLAKY" -> """Date,Open,High,Low,Close,Adj Close,Volume
                 |2024-01-02,30.0,31.0,29.5,30.5,29.89,3000""".stripMargin,
  )

  private def withServer(f: (String, ConcurrentHashMap[String, AtomicInteger]) => Unit): Unit = {
    val hits = new ConcurrentHashMap[String, AtomicInteger]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ohlcv", (x: HttpExchange) => {
      val q = x.getRequestURI.getQuery
      val sym = q.split('&').collectFirst {
        case kv if kv.startsWith("symbol=") => kv.stripPrefix("symbol=") }.getOrElse("")
      val n = hits.computeIfAbsent(sym, _ => new AtomicInteger()).incrementAndGet()
      val resp: Either[Int, String] = sym match {
        case "DEAD" => Left(500)                       // permanently down
        case "FLAKY" if n <= 2 => Left(503)            // first two attempts fail
        case s if csvFor.contains(s) => Right(csvFor(s))
        case "GARBLED" => Right("not,a,valid\nheader at all")
        case _ => Left(404)
      }
      resp match {
        case Left(code) => x.sendResponseHeaders(code, -1)
        case Right(body) =>
          val b = body.getBytes(UTF_8)
          x.sendResponseHeaders(200, b.length)
          x.getResponseBody.write(b)
      }
      x.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/ohlcv", hits)
    finally server.stop(0)
  }

  test("http transport fetches over real HTTP, retries transient failures, skips dead symbols") {
    withServer { (endpoint, hits) =>
      val df = spark.read.format("graft-ohlcv")
        .option("symbols", "AAA,BBB,FLAKY,DEAD,GARBLED,GONE")
        .option("transport", "http")
        .option("endpoint", endpoint)
        .option("maxRetries", "3")
        .option("retryBackoffMs", "0")
        .option("numPartitions", "2")
        .load()
      val rows = df.select("company", "Date", "Close", "Volume").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getDouble(2), r.getLong(3)))
        .sortBy(r => (r._1, r._2))

      // AAA 2 bars + BBB 1 + FLAKY 1 (after retries); DEAD and GARBLED skipped
      assert(rows.map(_._1).toSeq === Seq("AAA", "AAA", "BBB", "FLAKY"))
      assert(rows.head === (("AAA", "2024-01-02 00:00:00.0", 10.5, 1000L)))
      assert(rows.last === (("FLAKY", "2024-01-02 00:00:00.0", 30.5, 3000L)))

      // retry/skip accounting straight from the server's own hit counters
      assert(hits.get("FLAKY").get === 3, "two 503s then one 200")
      assert(hits.get("DEAD").get === 4, "500s retry: 1 try + maxRetries=3, then skipped")
      assert(hits.get("GONE").get === 1,
        "deterministic 4xx skips IMMEDIATELY — no retry budget burned")
      assert(hits.get("GARBLED").get >= 1, "malformed body consumes its attempts, then skips")
      assert(hits.get("AAA").get === 1 && hits.get("BBB").get === 1)
    }
  }

  test("http transport honors column pruning and derives year from the fetched Date") {
    withServer { (endpoint, _) =>
      val df = spark.read.format("graft-ohlcv")
        .option("symbols", "AAA")
        .option("transport", "http")
        .option("endpoint", endpoint)
        .option("retryBackoffMs", "0")
        .load()
        .select("company", "year")
      assert(df.collect().map(r => (r.getString(0), r.getInt(1))).toSeq ===
        Seq(("AAA", 2024), ("AAA", 2024)))
    }
  }

  test("transport option is validated at planning time") {
    val e1 = intercept[IllegalArgumentException] {
      spark.read.format("graft-ohlcv").option("symbols", "A")
        .option("transport", "carrier-pigeon").load().collect()
    }
    assert(e1.getMessage.contains("transport"))
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("graft-ohlcv").option("symbols", "A")
        .option("transport", "http").load().collect()
    }
    assert(e2.getMessage.contains("endpoint"))
  }
}
