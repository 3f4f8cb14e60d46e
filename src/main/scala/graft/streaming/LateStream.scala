package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import DriftStream.{CusumAlarm, CusumEvent, CusumState, TrendEvent, TrendRow, TrendState}
import TwapStream.{TwapEvent, TwapRow, TwapState}

/** Watermark-buffered variants of the sequential streaming twins
  * (r10 verdict #4). The base twins 18n/18o/18r fold in arrival order
  * under a per-key-ordered source contract and DROP out-of-order rows
  * — correct on a partitioned log, but real Kafka topics reorder
  * across producers within a key. These variants adopt the 18c
  * [[EventStream.asofStream]] pattern instead: every row BUFFERS
  * per key until the watermark passes its event time (only then can
  * nothing earlier still arrive — Spark's late-drop predicate is
  * `ts <= watermark`, inclusive, so released prefixes are final);
  * released rows fold in EVENT-TIME order through the exact same fold
  * functions as the base twins, so any replay whose disorder stays
  * within the watermark horizon produces the batch rows exactly
  * (LateStreamSpec replays SCRAMBLED micro-batches).
  *
  * State: the base twin's constant/calendar-bounded core state plus
  * the pending buffer, which the watermark horizon bounds (rows
  * older than the watermark are dropped by Spark before they reach
  * the function) — run-forever safe at the same order as the base
  * twin plus (rate × horizon) buffered rows per key.
  *
  * Release timing: the group function only runs on new data or a
  * fired timeout, so after buffering, an event-time timeout is set to
  * the earliest pending timestamp (clamped past the current
  * watermark) — buffered rows release as soon as the watermark
  * passes them even if the key never receives another row.
  */
object LateStream {

  // --------------------------------------------- late-tolerant CUSUM (18n)

  case class CusumLateState(core: CusumState, pending: List[CusumEvent],
      maxTs: Long)

  /** [[DriftStream.cusumStream]] with watermark buffering: rows fold
    * in (ts, seq) order — the batch operator's order — once the
    * watermark passes their event time. `seq` must still be monotone
    * with ts per key (it is the tiebreak within equal timestamps). */
  def cusumStreamLate(events: Dataset[CusumEvent], targetCents: Long,
      kCents: Long, hCents: Long,
      watermark: String = "10 minutes"): Dataset[CusumAlarm] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.g)
      .flatMapGroupsWithState[CusumLateState, CusumAlarm](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (g, rows, state) =>
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(
            CusumLateState(CusumState(0L, 0L, Long.MinValue), Nil, 0L))
          var pending = prev.pending
          var maxTs = prev.maxTs
          rows.foreach { e =>
            pending ::= e
            maxTs = math.max(maxTs, e.ts.getTime)
          }
          val (ready, rest) = pending.partition(_.ts.getTime <= wm)
          val (core, alarms) = DriftStream.cusumFold(g, prev.core,
            ready.sortBy(e => (e.ts.getTime, e.seq)),
            targetCents, kCents, hCents)
          state.update(CusumLateState(core, rest, maxTs))
          if (rest.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(wm + 1, rest.map(_.ts.getTime).min))
          alarms.iterator
      }
  }

  // ---------------------------------------------- late-tolerant TWAP (18o)

  /** [[TwapStream.TwapEvent]] plus the event timestamp the watermark
    * tracks; `us` stays the exact microsecond order key (ts is its
    * millisecond truncation — watermark release only needs ms). */
  case class TwapLateEvent(g: Long, ts: Timestamp, us: Long, tie: Long,
      v: Double)
  case class TwapLateState(core: TwapState, pending: List[TwapLateEvent],
      maxTs: Long)

  /** [[TwapStream.twapStream]] with watermark buffering: released rows
    * fold in (us, tie) order — the batch q113 order. Emits the
    * refreshed summary row whenever an invocation folded anything. */
  def twapStreamLate(events: Dataset[TwapLateEvent],
      watermark: String = "10 minutes"): Dataset[TwapRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.g)
      .flatMapGroupsWithState[TwapLateState, TwapRow](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (g, rows, state) =>
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(
            TwapLateState(TwapStream.EmptyState, Nil, 0L))
          var pending = prev.pending
          var maxTs = prev.maxTs
          rows.foreach { e =>
            pending ::= e
            maxTs = math.max(maxTs, e.ts.getTime)
          }
          val (ready, rest) = pending.partition(_.ts.getTime <= wm)
          val core = TwapStream.twapFold(prev.core,
            ready.sortBy(e => (e.us, e.tie))
              .map(e => TwapEvent(e.g, e.us, e.tie, e.v)))
          state.update(TwapLateState(core, rest, maxTs))
          if (rest.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(wm + 1, rest.map(_.ts.getTime).min))
          if (ready.isEmpty) Iterator.empty
          else TwapStream.twapRow(g, core).iterator
      }
  }

  // -------------------------------------- late-tolerant Mann–Kendall (18r)

  /** [[DriftStream.TrendEvent]] plus the event timestamp the
    * watermark tracks (e.g. the bucket's end-of-day instant). */
  case class TrendLateEvent(g: String, ts: Timestamp, day: Long, xc: Long)
  case class TrendLateState(core: TrendState, pending: List[TrendLateEvent],
      maxTs: Long)

  /** [[DriftStream.mkTrendStream]] with watermark buffering: released
    * buckets fold in day order. Emits the refreshed test row after
    * each fold (update semantics, like the base twin). */
  def mkTrendStreamLate(events: Dataset[TrendLateEvent],
      watermark: String = "10 minutes"): Dataset[TrendRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.g)
      .flatMapGroupsWithState[TrendLateState, TrendRow](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (g, rows, state) =>
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(
            TrendLateState(TrendState(Map.empty, 0L, 0L, Long.MinValue, 0L),
              Nil, 0L))
          var pending = prev.pending
          var maxTs = prev.maxTs
          rows.foreach { e =>
            pending ::= e
            maxTs = math.max(maxTs, e.ts.getTime)
          }
          val (ready, rest) = pending.partition(_.ts.getTime <= wm)
          val (core, out) = DriftStream.mkFold(g, prev.core,
            ready.sortBy(_.day).map(e => TrendEvent(e.g, e.day, e.xc)))
          state.update(TrendLateState(core, rest, maxTs))
          if (rest.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(wm + 1, rest.map(_.ts.getTime).min))
          out.lastOption.iterator // refreshed row: the newest fold state
      }
  }
}
