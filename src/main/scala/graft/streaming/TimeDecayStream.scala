package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.TimeDecay]] (q294) — the
  * fractional-credit attribution computed AT ARRIVAL. Each user keeps
  * the touches of the trailing lookback window (state bounded by
  * per-user activity in one week — the exact pair bound the batch
  * join carries); every purchase is credited the moment it lands:
  * in-window touches get the e^(−Δt/τ) weights through the IDENTICAL
  * integer arithmetic as the batch operator (per-pair 1e-9-floored
  * weights, integer normalizer, floored share/revenue credits), so
  * an ordered replay's per-type rollup reproduces the registered
  * q294 output BIT-FOR-BIT (spec-asserted), organic fallback
  * included.
  *
  * Emission: one row per (purchase, credited type) in append mode;
  * the channel report is a downstream integer aggregation either
  * way. Within a micro-batch a user's rows apply in (ts, event_id)
  * order — the batch total order; across batches arrival order
  * governs (the 18-series contract). */
object TimeDecayStream {

  case class TdEvent(user_id: Long, ts: Timestamp, event_id: Long,
      event_type: String, value: Option[Double])
  case class TdCredit(user_id: Long, ts: Timestamp, touch_type: String,
      n_pairs: Long, share_n: Long, rev_n: Long)
  case class TdState(touches: List[(String, Long)])

  private val Touches = Set("view", "click", "signup")
  private val LookbackMs =
    graft.operators.TimeDecay.LookbackDays * 86400000L
  private val TauSec = graft.operators.TimeDecay.TauSeconds

  def timeDecayStream(events: Dataset[TdEvent]): Dataset[TdCredit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TdState, TdCredit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, rows, st: GroupState[TdState]) =>
          var touches = st.getOption.map(_.touches).getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer.empty[TdCredit]
          rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id)).foreach { r =>
            val tMs = r.ts.getTime
            if (Touches(r.event_type))
              touches = (r.event_type, tMs) :: touches
            else if (r.event_type == "purchase") {
              val revFixed = math.floor(r.value.getOrElse(0.0) * 10000).toLong
              val inWin = touches.filter { case (_, ts) =>
                ts <= tMs && ts >= tMs - LookbackMs
              }
              if (inWin.isEmpty)
                out += TdCredit(user, r.ts, "organic", 1L, 1000000000L,
                  revFixed)
              else {
                // the batch chain verbatim: floor-second Δt, 1e-9-floored
                // weight per pair, exact integer normalizer, floored
                // per-pair share and revenue credits
                val ws = inWin.map { case (tp, ts) =>
                  val dt = tMs / 1000L - ts / 1000L
                  (tp, math.floor(
                    math.exp(-(dt.toDouble / TauSec)) * 1e9).toLong)
                }
                val wSum = ws.map(_._2).sum
                ws.groupBy(_._1).foreach { case (tp, g) =>
                  val share = g.map { case (_, w) =>
                    math.floor(w.toDouble * 1e9 / wSum).toLong
                  }.sum
                  val rev = g.map { case (_, w) =>
                    math.floor(revFixed.toDouble * w / wSum).toLong
                  }.sum
                  out += TdCredit(user, r.ts, tp, g.size.toLong, share, rev)
                }
              }
            }
            // prune state to the trailing window of the newest event
            touches = touches.filter(_._2 >= tMs - LookbackMs)
          }
          st.update(TdState(touches))
          out.iterator
      }
  }
}
