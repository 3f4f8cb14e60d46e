package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming group-sequential monitor (18w) — the continuous twin of
  * [[graft.operators.Sequential.orderFinishMonitor]] (q153), which is
  * the operator that WANTS to be a stream: a look "happens" exactly
  * when its accrual period closes. Unit events buffer until the
  * watermark passes their look's end instant (the [[LateStream]]
  * machinery — any disorder within the horizon is tolerated); each
  * fully-closed look then folds IN LOOK ORDER into the cumulative
  * per-arm counts and emits its boundary row the moment it completes —
  * the decision fires months before a batch job would see it.
  *
  * The one design difference from batch: the information denominator.
  * Batch uses the realized final count (it has it); a live monitor
  * cannot, so the caller supplies the PLANNED total information
  * `plannedTotal` — exactly how group-sequential designs are
  * pre-registered in practice (the boundary is fixed at design time).
  * Feeding the realized total reproduces the batch rows bit-for-bit
  * (the parity spec's configuration).
  *
  * State: one global key (a sequential monitor is inherently a single
  * accumulator — its state is 4 longs + the horizon-bounded buffer,
  * so the single-key shape costs nothing), cumulative counts, the
  * last closed look, and the decided flag.
  */
object SequentialStream {

  case class ObfEvent(ts: Timestamp, look: Int, t: Int, conv: Int)
  case class ObfState(pending: List[ObfEvent], lastLook: Int,
      na: Long, xa: Long, nb: Long, xb: Long, decided: Boolean, maxTs: Long)
  case class LookRow(look: Int, na: Long, xa: Long, nb: Long, xb: Long,
      t_frac: Double, z: Double, bound: Double, crossed: Boolean,
      is_decision: Boolean)

  private def r(v: Double, s: Int): Double =
    BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The batch operator's shared z / boundary arithmetic in JVM form
    * (same IEEE ops from the same exact integers). */
  private[streaming] def lookRow(look: Int, na: Long, xa: Long, nb: Long,
      xb: Long, plannedTotal: Long, c: Double,
      decidedBefore: Boolean): LookRow = {
    val pp = (xa + xb).toDouble / (na + nb)
    val z0 = (xa.toDouble / na - xb.toDouble / nb) /
      math.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
    val t = (na + nb).toDouble / plannedTotal
    val bound0 = c / math.sqrt(t)
    val crossed = math.abs(z0) > bound0
    LookRow(look, na, xa, nb, xb, r(t, 4), r(z0, 4), r(bound0, 4),
      crossed, crossed && !decidedBefore)
  }

  /** 18w: emit one boundary row per CLOSED look. `lookEndMs` maps a
    * look id to the epoch-ms instant at which its accrual ends (for
    * yearly looks: Jan 1 of the next year). */
  def obfStream(events: Dataset[ObfEvent], plannedTotal: Long,
      lookEndMs: Int => Long, c: Double = 2.040,
      watermark: String = "10 minutes"): Dataset[LookRow] = {
    import events.sparkSession.implicits._
    require(plannedTotal > 0)
    events
      .withWatermark("ts", watermark)
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[ObfState, LookRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows, state) =>
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption.getOrElse(
            ObfState(Nil, Int.MinValue, 0L, 0L, 0L, 0L, false, 0L))
          var pending = st.pending
          var maxTs = st.maxTs
          rows.foreach { e =>
            pending ::= e
            maxTs = math.max(maxTs, e.ts.getTime)
          }
          // a look closes when the watermark passes its end instant;
          // closed looks fold cumulatively in look order
          val closable = pending.map(_.look).distinct
            .filter(lk => lookEndMs(lk) <= wm).sorted
          val out = scala.collection.mutable.ListBuffer[LookRow]()
          var (na, xa, nb, xb) = (st.na, st.xa, st.nb, st.xb)
          var lastLook = st.lastLook
          var decided = st.decided
          closable.foreach { lk =>
            val (mine, rest) = pending.partition(_.look == lk)
            pending = rest
            mine.foreach { e =>
              if (e.t == 0) { na += 1; xa += e.conv }
              else { nb += 1; xb += e.conv }
            }
            if (na > 0 && nb > 0) {
              val row = lookRow(lk, na, xa, nb, xb, plannedTotal, c, decided)
              decided = decided || row.crossed
              out += row
            }
            lastLook = math.max(lastLook, lk)
          }
          st = ObfState(pending, lastLook, na, xa, nb, xb, decided, maxTs)
          state.update(st)
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(math.max(wm + 1,
              pending.map(e => lookEndMs(e.look)).min))
          out.iterator
      }
  }
}
