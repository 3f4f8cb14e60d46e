package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming per-unit conversion changelog — the continuous feed
  * under q132's two-proportion A/B readout: each micro-batch emits a
  * refreshed (unit, outcome) snapshot for every unit it touched; the
  * dashboard compacts the changelog (max event-count row per unit)
  * and runs [[graft.operators.PropTest.propZTest]] over it, so the
  * LIVE z equals the batch z for the same prefix of the feed exactly
  * (the parity spec's assertion).
  *
  * The split of labor is deliberate: per-unit outcome state is the
  * unbounded-cardinality side (entity-dimension state, the
  * [[EwmaStream]] shape — run-forever safe); the z itself is a 4-
  * integer statistic the READ layer derives, because chaining a
  * second stateful aggregate behind flatMapGroupsWithState is both
  * restricted in append streams and pointless for a 2×2 table.
  *
  * Outcome rule: success-heavy unit — mult·successes > total events
  * (q132's registered convention at mult = 5; "ever succeeded"
  * saturates on feeds where every unit eventually converts).
  */
object PropStream {

  case class PropEvent(u: Long, seq: Long, success: Boolean)
  case class PropState(nSucc: Long, nTot: Long, lastSeq: Long)
  case class ConvSnapshot(u: Long, n_events: Long, conv: Int)

  /** Per-unit outcome changelog; stale rows (seq ≤ last seen) are
    * dropped under the [[EwmaStream]] ordering contract. */
  def convStream(events: Dataset[PropEvent], mult: Long = 5L)
      : Dataset[ConvSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.u)
      .flatMapGroupsWithState[PropState, ConvSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (u, rows, state) =>
          var st = state.getOption.getOrElse(PropState(0L, 0L, Long.MinValue))
          var touched = false
          rows.toSeq.sortBy(_.seq).foreach { e =>
            if (e.seq > st.lastSeq) {
              st = PropState(st.nSucc + (if (e.success) 1L else 0L),
                st.nTot + 1L, e.seq)
              touched = true
            }
          }
          state.update(st)
          if (touched)
            Iterator.single(ConvSnapshot(u, st.nTot,
              if (mult * st.nSucc > st.nTot) 1 else 0))
          else Iterator.empty
      }
  }
}
