package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming time-weighted average — the continuous twin of q113
  * ([[graft.operators.Twap.timeWeightedAvg]]): per-series TWAP
  * maintained incrementally as events arrive, one updated summary row
  * per series per micro-batch.
  *
  * State design: FIVE scalars per series — last (us, tie, vc), the
  * accumulated weight Σ Δus (Long) and weighted sum Σ vc·Δus
  * (BigDecimal — the batch operator's DECIMAL(38,0) accumulator; a
  * Long would overflow at cents × multi-year-micros). Constant state,
  * run-forever safe; the step-function (LOCF) reading means arrival
  * of event i CLOSES interval i−1, so the fold needs only the
  * previous event.
  *
  * Ordering contract: per-key-ordered source, like
  * [[DriftStream.cusumStream]] — a late row cannot retro-split an
  * interval already folded, so rows at or before the last (us, tie)
  * are dropped. Equal-microsecond ties fold with Δ = 0 exactly as in
  * batch.
  *
  * Parity contract: after an ordered replay, the LAST emitted row per
  * series is EQUAL (same rounding grid, HALF_UP like Spark's round)
  * to the batch operator's row — asserted by the parity spec. */
object TwapStream {

  /** (series, total order in micros + tie, value cents via the batch
    * floor). */
  case class TwapEvent(g: Long, us: Long, tie: Long, v: Double)
  case class TwapState(lastUs: Long, lastTie: Long, lastVc: Long,
      wUs: Long, vw: BigDecimal, n: Long)
  case class TwapRow(user_id: Long, n_events: Long, n_intervals: Long,
      span_s: Double, twap: Option[Double])

  private def r(v: Double, s: Int): Double =
    BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  private[streaming] val EmptyState =
    TwapState(Long.MinValue, Long.MinValue, 0L, 0L, BigDecimal(0), 0L)

  /** The pure TWAP fold over PRE-SORTED events — shared by
    * [[twapStream]] (sorted within an invocation, ordered-source
    * contract) and [[LateStream.twapStreamLate]] (sorted over a
    * watermark-released buffer). Drops anything at or behind the
    * folded (us, tie) frontier. */
  private[streaming] def twapFold(st0: TwapState,
      sorted: Seq[TwapEvent]): TwapState = {
    var st = st0
    sorted.foreach { e =>
      val inOrder = e.us > st.lastUs ||
        (e.us == st.lastUs && e.tie > st.lastTie)
      if (inOrder) {
        val vc = math.floor(e.v * 100.0).toLong
        st =
          if (st.n == 0L) TwapState(e.us, e.tie, vc, 0L, st.vw, 1L)
          else {
            val dus = e.us - st.lastUs
            TwapState(e.us, e.tie, vc, st.wUs + dus,
              st.vw + BigDecimal(st.lastVc) * BigDecimal(dus),
              st.n + 1L)
          }
      } // else: out-of-order — dropped (ordered-source contract)
    }
    st
  }

  /** The refreshed summary row for a series (None while empty). */
  private[streaming] def twapRow(g: Long, st: TwapState): Option[TwapRow] =
    if (st.n == 0L) None
    else Some(TwapRow(g, st.n, st.n - 1L,
      r(st.wUs.toDouble / 1e6, 3),
      if (st.wUs == 0L) None
      else Some(r(st.vw.toDouble / st.wUs.toDouble / 100.0, 6))))

  def twapStream(events: Dataset[TwapEvent]): Dataset[TwapRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.g)
      .flatMapGroupsWithState[TwapState, TwapRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g, rows, state) =>
          val st = twapFold(state.getOption.getOrElse(EmptyState),
            rows.toSeq.sortBy(e => (e.us, e.tie)))
          state.update(st)
          twapRow(g, st).iterator
      }
  }
}
