package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming level-cell changelog — the continuous feed under q168's
  * Cochran–Armitage trend readout: each micro-batch emits a refreshed
  * (level, n, x) cell snapshot for every exposure level it touched;
  * the dashboard compacts the changelog (max trial-count row per
  * level) and runs [[graft.operators.TrendTest.fromCells]] over it,
  * so the LIVE trend z equals the batch z for the same prefix of the
  * feed exactly (the parity spec's assertion).
  *
  * The split of labor follows [[PropStream]]: the stateful side keeps
  * only the k level cells (k is the SCORED-LEVEL count — bounded by
  * design, the safest state cardinality in the streaming deck), and
  * the five sufficient statistics the z needs are derived by the read
  * layer from those k rows. Stale rows (seq ≤ last seen per level)
  * are dropped under the [[EwmaStream]] ordering contract, so
  * replayed batches and duplicate deliveries never double-count. */
object TrendStream {

  case class TrendEvent(w: Long, seq: Long, success: Boolean)
  case class LevelState(n: Long, x: Long, lastSeq: Long)
  case class CellSnapshot(w: Long, n_c: Long, x_c: Long)

  /** Per-level cell changelog keyed by the integer level score. */
  def cellStream(events: Dataset[TrendEvent]): Dataset[CellSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.w)
      .flatMapGroupsWithState[LevelState, CellSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (w, rows, state) =>
          var st = state.getOption.getOrElse(LevelState(0L, 0L, Long.MinValue))
          var touched = false
          rows.toSeq.sortBy(_.seq).foreach { e =>
            if (e.seq > st.lastSeq) {
              st = LevelState(st.n + 1L,
                st.x + (if (e.success) 1L else 0L), e.seq)
              touched = true
            }
          }
          state.update(st)
          if (touched) Iterator.single(CellSnapshot(w, st.n, st.x))
          else Iterator.empty
      }
  }
}
