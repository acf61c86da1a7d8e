package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.operators.TechnicalIndicators.rhaDiv

/** One (key, ord, units) observation's indicator row as maintained by the
  * stream: the Holt level/trend state AFTER folding this observation. */
case class IndicatorRow(key: Long, ord: Long, valueUnits: Long,
                        levelMicro: Long, trendMicro: Long)

/** Per-key indicator state carried across micro-batches. `started`
  * distinguishes the empty state explicitly — an ord sentinel would
  * silently drop a legitimate observation at ord == Long.MinValue. */
case class IndicatorState(started: Boolean, lastOrd: Long,
                          levelMicro: Long, trendMicro: Long)

/** S-STRMTA (round 9): STREAMING technical-indicator maintenance — the
  * reference's own stated future is "daily stock data updates", and this is
  * what that update costs when done right: each micro-batch folds ONLY the
  * newly-arrived observations into a per-key (level, trend) Holt state,
  * instead of re-running the serial recurrence over all history (which
  * grows linearly with the series age, forever).
  *
  * Contract (spec-enforced, the incremental==batch discipline of
  * [[StreamingDedup]]): provided per-key observations arrive in ord order
  * ACROSS batches (within a batch any order — the fold sorts), the emitted
  * rows equal `TechnicalIndicators.holtMicro` run as one batch over the
  * union of all batches, row for row. The recurrences are the identical
  * exact-integer micro steps — no IEEE result enters state, so streaming
  * vs batch can never drift by representation.
  *
  * Replay/late-data rule: an observation at ord <= the key's lastOrd is
  * DROPPED (emitting nothing) — a serial recurrence cannot splice history
  * without recomputing forward, so late rows route to a batch backfill
  * (exactly the [[IncrementalUpdate]] partition-rewrite path); replayed
  * micro-batches are therefore idempotent on state.
  *
  * State is three longs per key — bounded by the live key universe, not by
  * history. */
object StreamingIndicators {

  /** Fold (key, ord, units) observations into streaming Holt state.
    * alpha/beta as in [[graft.operators.TechnicalIndicators.holtMicro]];
    * emits one row per ACCEPTED observation (Update mode). */
  def holtOnArrival(obs: Dataset[(Long, Long, Long)], unitsScale: Int,
                    alphaNum: Long, alphaDen: Long,
                    betaNum: Long, betaDen: Long): Dataset[IndicatorRow] = {
    require(unitsScale >= 0 && unitsScale <= 6, s"unitsScale: $unitsScale")
    require(alphaDen > 0 && alphaNum > 0 && alphaNum <= alphaDen &&
      betaDen > 0 && betaNum > 0 && betaNum <= betaDen,
      s"alpha/beta must be in (0,1]: $alphaNum/$alphaDen, $betaNum/$betaDen")
    val spark = obs.sparkSession
    import spark.implicits._
    val up = math.pow(10.0, 6 - unitsScale).toLong
    obs.groupByKey(_._1)
      .flatMapGroupsWithState[IndicatorState, IndicatorRow](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[IndicatorState]) =>
          // sort the batch's arrivals; the cross-batch order contract does
          // the rest. Bounded: one batch's rows for one key.
          val sorted = rows.toSeq.sortBy(_._2)
          var st = state.getOption.getOrElse(
            IndicatorState(started = false, 0L, 0L, 0L))
          val out = Seq.newBuilder[IndicatorRow]
          sorted.foreach { case (_, ord, units) =>
            if (!st.started || ord > st.lastOrd) {
              st =
                if (!st.started)
                  IndicatorState(started = true, ord, units * up, 0L)
                else {
                  val prevLvl = st.levelMicro
                  val lvl = rhaDiv(alphaNum * units * up +
                    (alphaDen - alphaNum) * (st.levelMicro + st.trendMicro),
                    alphaDen)
                  val trd = rhaDiv(betaNum * (lvl - prevLvl) +
                    (betaDen - betaNum) * st.trendMicro, betaDen)
                  IndicatorState(started = true, ord, lvl, trd)
                }
              out += IndicatorRow(key, ord, units, st.levelMicro, st.trendMicro)
            } // else: late/replayed observation — dropped, state untouched
          }
          state.update(st)
          out.result().iterator
      }
  }
}
