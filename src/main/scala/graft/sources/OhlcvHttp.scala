package graft.sources

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.LocalDate

import scala.util.Try

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.unsafe.types.UTF8String

/** HTTP transport for the `graft-ohlcv` source (round 6, VERDICT item 8):
  * the reference's real acquisition is a per-symbol HTTP download with
  * retry and skip-on-failure (R5/R6 — `yf.download` in a try/except that
  * logs and continues, `stock_data_airflow_local_aws_s3.py:36-42`). Here
  * that is a `PartitionReader`: each executor fetches ITS symbol chunk
  * over plain `HttpURLConnection` (JDK-only), so going live is a CONFIG
  * change — `.option("transport", "http").option("endpoint", url)` — not
  * new code. The offline sandbox drives exactly this reader against a
  * loopback `com.sun.net.httpserver` fixture (OhlcvHttpSourceSpec), which
  * is also how a deployment smoke-tests it without touching the vendor.
  *
  * Per symbol: GET `endpoint?symbol=S&start=YYYY-MM-DD&days=N`, expect a
  * `Date,Open,High,Low,Close,Adj Close,Volume` CSV. Non-200s and IO
  * errors retry up to `maxRetries` times with linear backoff
  * (`retryBackoffMs * attempt`); a symbol still failing — or returning a
  * malformed body — is SKIPPED with a log line, and the scan continues
  * (R6: one dead ticker must not kill the day's load). Skips surface in
  * executor logs, mirroring the reference's behavior; stricter pipelines
  * quarantine at file level via `IngestEgress.readCsvWithQuarantine`.
  *
  * Scale posture: symbol-chunk partitions fan the fetch across executors
  * (a 5k-symbol daily load is 5k independent GETs — embarrassingly
  * parallel); column pruning still applies, and row decode allocates per
  * pruned column only.
  */
object OhlcvFetch {

  /** Transport selection + retry policy, carried inside every input
    * partition (serialized to executors). */
  case class Config(transport: String, endpoint: String,
                    maxRetries: Int, retryBackoffMs: Long)

  /** GET `url`, retrying on 5xx / 429 / IO error. Returns the body, or None
    * after the budget is exhausted (caller skips). Deterministic client
    * errors (4xx other than 429) fail IMMEDIATELY: a bad symbol or
    * malformed request returns the same 4xx on every attempt, and at 5k
    * symbols a misconfigured endpoint would otherwise burn
    * 5k x maxRetries x backoff of idle executor-thread sleep before the
    * scan finishes skipping. */
  private[sources] def get(url: String, maxRetries: Int, backoffMs: Long): Option[String] = {
    var attempt = 0
    while (attempt <= maxRetries) {
      val result: Either[Boolean, String] = Try {
        val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod("GET")
        conn.setConnectTimeout(10000)
        conn.setReadTimeout(30000)
        try {
          val code = conn.getResponseCode
          if (code == 200) Right(new String(conn.getInputStream.readAllBytes(), UTF_8))
          else Left(code >= 500 || code == 429) // retryable?
        } finally conn.disconnect()
      }.getOrElse(Left(true)) // IO error: transient, retry
      result match {
        case Right(body) => return Some(body)
        case Left(false) => return None // deterministic 4xx: skip now
        case Left(true) => ()
      }
      attempt += 1
      if (attempt <= maxRetries && backoffMs > 0) Thread.sleep(backoffMs * attempt)
    }
    None
  }

  /** One parsed CSV bar. */
  private[sources] case class CsvBar(date: LocalDate, open: Double, high: Double,
                                     low: Double, close: Double, adjClose: Double,
                                     volume: Long)

  private[sources] val Header = "Date,Open,High,Low,Close,Adj Close,Volume"

  /** Strict parse of the OHLCV CSV contract; None on any malformed line or
    * a wrong header (the caller treats the symbol as failed — same skip
    * path as a dead endpoint). */
  private[sources] def parseCsv(body: String): Option[Seq[CsvBar]] = Try {
    val lines = body.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    require(lines.nonEmpty && lines.head == Header, s"bad header: ${lines.headOption}")
    lines.tail.map { l =>
      val f = l.split(',')
      require(f.length == 7, s"bad row: $l")
      CsvBar(LocalDate.parse(f(0)), f(1).toDouble, f(2).toDouble, f(3).toDouble,
        f(4).toDouble, f(5).toDouble, f(6).toLong)
    }
  }.toOption
}

/** Decodes the pruned columns of each fetched bar; symbols whose fetch or
  * parse fails after retries are skipped (logged), not fatal. */
class OhlcvHttpPartitionReader(p: OhlcvInputPartition)
    extends PartitionReader[InternalRow] with Logging {
  import OhlcvFetch._

  private val fields = p.schema.fieldNames

  private val bars: Iterator[(String, CsvBar)] = p.symbols.iterator.flatMap { sym =>
    val url = s"${p.fetch.endpoint}?symbol=${URLEncoder.encode(sym, UTF_8)}" +
      s"&start=${p.startDate}&days=${p.days}"
    OhlcvFetch.get(url, p.fetch.maxRetries, p.fetch.retryBackoffMs)
      .flatMap(OhlcvFetch.parseCsv) match {
      case Some(rows) => rows.iterator.map(sym -> _)
      case None =>
        // fetch exhausted its retry budget OR a 200 body failed the CSV
        // contract (parse failures don't retry) — don't claim N network
        // attempts that may not have happened
        logWarning(s"graft-ohlcv: skipping symbol $sym (fetch failed after up to " +
          s"${p.fetch.maxRetries + 1} attempts, or response failed to parse) " +
          s"at ${p.fetch.endpoint}")
        Iterator.empty
    }
  }

  private var current: InternalRow = _

  override def next(): Boolean =
    if (!bars.hasNext) false
    else {
      val (sym, bar) = bars.next()
      val values = fields.map {
        case "company"   => UTF8String.fromString(sym)
        case "year"      => bar.date.getYear
        case "Date"      => OhlcvGen.midnightMicros(bar.date)
        case "Open"      => bar.open
        case "High"      => bar.high
        case "Low"       => bar.low
        case "Close"     => bar.close
        case "Adj Close" => bar.adjClose
        case "Volume"    => bar.volume
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
