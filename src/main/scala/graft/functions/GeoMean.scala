package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.B Q-AGG6 / §2.C): geometric mean via
  * log-sum — the canonical aggregate for compounding returns, which is the
  * analysis the reference's OHLCV layout exists to serve (`README.md:46`).
  *
  * A typed `Aggregator` gets partial (map-side) aggregation for free —
  * unlike the legacy UserDefinedAggregateFunction path — so it scales like
  * a built-in: one shuffle of (sumLog, n) pairs, not of rows.
  */
object GeoMean {

  case class Buf(sumLog: Double, n: Long)

  val agg: Aggregator[Double, Buf, Double] = new Aggregator[Double, Buf, Double] {
    def zero: Buf = Buf(0.0, 0L)
    def reduce(b: Buf, x: Double): Buf = Buf(b.sumLog + math.log(x), b.n + 1)
    def merge(a: Buf, b: Buf): Buf = Buf(a.sumLog + b.sumLog, a.n + b.n)
    def finish(r: Buf): Double = if (r.n == 0) Double.NaN else math.exp(r.sumLog / r.n)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
