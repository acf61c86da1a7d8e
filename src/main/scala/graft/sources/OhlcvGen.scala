package graft.sources

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.time.LocalDate
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Pure row kernel of the deterministic synthetic OHLCV generator — the
  * scalar twin of `StockPipeline.syntheticPrices`'s Column formulas
  * (reference R5, `stock_data_airflow_local_aws_s3.py:36-42`, replaced
  * offline by a hash-seeded random walk). Both implementations MUST stay
  * in lockstep: `OhlcvSourceSpec` asserts the DSv2 scan and the
  * expression-generated DataFrame are row-identical.
  *
  * Hashing is Spark's own XXH64 (seed 42, chained per argument exactly as
  * the `xxhash64` expression chains its children), so equality holds
  * bitwise, not just approximately.
  */
object OhlcvGen {

  private val Seed = 42L
  private val M = 1000000L

  private def pmod(a: Long, m: Long): Long = ((a % m) + m) % m

  /** xxhash64(Symbol, day_idx, saltLiteral) — string, long, int children. */
  private def hash3(sym: UTF8String, dayIdx: Long, salt: Int): Long = {
    var h = XXH64.hashUTF8String(sym, Seed)
    h = XXH64.hashLong(dayIdx, h)
    XXH64.hashInt(salt, h)
  }

  /** Spark `round(x, 2)` on doubles: scala.BigDecimal(double) = JBigDecimal
    * valueOf (shortest-decimal repr, NOT the exact binary expansion — the
    * two differ on halfway values), then HALF_UP. */
  private def r2(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(2, RoundingMode.HALF_UP).doubleValue()

  /** All generated measures for one (symbol, trading-day) cell. */
  final case class Bar(open: Double, high: Double, low: Double,
                       close: Double, adjClose: Double, volume: Long)

  def bar(sym: UTF8String, dayIdx: Long): Bar = {
    def u(salt: Int): Double = pmod(hash3(sym, dayIdx, salt), M).toDouble / 1000000.0
    val base = 50.0 + pmod(XXH64.hashUTF8String(sym, Seed), 100L).toDouble
    val drift = (u(1) - 0.5) * 4.0
    val close = base + drift + (u(4) - 0.5) * 2.0
    Bar(
      open = r2(base + drift),
      high = r2(base + drift + u(2) * 2.0),
      low = r2(math.max(base + drift - u(3) * 2.0, 0.01)),
      close = r2(close),
      adjClose = r2(close * 0.98),
      volume = pmod(hash3(sym, dayIdx, 9), M) + 100L)
  }

  /** Trading-day filter: weekday() in (5,6) = Saturday/Sunday excluded. */
  def isTradingDay(d: LocalDate): Boolean = d.getDayOfWeek.getValue <= 5

  /** Midnight-UTC timestamp micros of a date (sessions run UTC). */
  def midnightMicros(d: LocalDate): Long = d.toEpochDay * 86400000000L
}
