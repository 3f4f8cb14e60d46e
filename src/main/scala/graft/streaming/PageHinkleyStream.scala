package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming Page–Hinkley drift monitor — the ONLINE twin of q226:
  * the batch operator reads the retrospective drawup/drawdown of the
  * mean-centered walk; the production monitor cannot see the final
  * mean, so it runs the classic online recursion against the RUNNING
  * mean (Page 1954 / Gama et al. 2014 form, δ = 0 here — the
  * caller's drift allowance folds into λ):
  *
  *   x̄_t = ((t−1)·x̄_{t−1} + x_t)/t
  *   m_t = m_{t−1} + (x_t − x̄_t)
  *   PH⁺_t = m_t − min_{u≤t} m_u     (alarm when > λ)
  *   PH⁻_t = max_{u≤t} m_u − m_t
  *
  * Semantics note (documented, deliberate): the online statistic is
  * NOT the batch q226 number — the running mean lags the final mean —
  * so the parity contract here is "stream ≡ the same online recursion
  * folded over the sorted prefix" (the spec's reference fold), plus
  * the behavioral guarantee that a planted level shift raises PH⁺
  * past any λ below its cumulative magnitude.
  *
  * State per series: (n, mean, m, minM, maxM, lastSeq) — six scalars,
  * the constant-state contract every 18-series twin holds. Stale rows
  * (seq ≤ last seen) are dropped under the [[EwmaStream]] ordering
  * contract so replays never double-count. The in-batch fold is
  * sequential BY DESIGN (the recursion is order-defined); arithmetic
  * is a deterministic double fold — bit-reproducible for a given
  * event order, which the seq contract pins. */
object PageHinkleyStream {

  case class PhEvent(g: Long, seq: Long, x: Double)
  case class PhState(n: Long, mean: Double, m: Double,
      minM: Double, maxM: Double, lastSeq: Long)
  case class PhSnapshot(g: Long, seq: Long, n: Long,
      ph_up: Double, ph_down: Double)

  val InitState: PhState =
    PhState(0L, 0.0, 0.0, 0.0, 0.0, Long.MinValue)

  /** One step of the online recursion — shared by the stream and the
    * spec's reference fold (parity is over THIS function). */
  def step(st: PhState, x: Double, seq: Long): PhState = {
    val n = st.n + 1L
    val mean = (st.mean * st.n + x) / n
    val m = st.m + (x - mean)
    PhState(n, mean, m,
      math.min(st.minM, m), math.max(st.maxM, m), seq)
  }

  def phOf(st: PhState): (Double, Double) =
    (st.m - st.minM, st.maxM - st.m)

  /** Per-series PH changelog: each micro-batch emits the refreshed
    * (n, PH⁺, PH⁻) for every series it touched. */
  def phStream(events: Dataset[PhEvent]): Dataset[PhSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.g)
      .flatMapGroupsWithState[PhState, PhSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g, rows, state) =>
          var st = state.getOption.getOrElse(InitState)
          var touched = false
          rows.toSeq.sortBy(_.seq).foreach { e =>
            if (e.seq > st.lastSeq) {
              st = step(st, e.x, e.seq)
              touched = true
            }
          }
          state.update(st)
          if (touched) {
            val (up, dn) = phOf(st)
            Iterator.single(PhSnapshot(g, st.lastSeq, st.n, up, dn))
          } else Iterator.empty
      }
  }
}
