package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.JarqueBera

/** Streaming moment-sum changelog — the continuous feed under q180's
  * Jarque–Bera readout: each micro-batch refreshes a per-group
  * snapshot of the four power sums around a FIXED integer pivot (the
  * streaming side cannot two-pass for the batch pivot ⌊Σx/n⌋, so the
  * caller picks a domain-scaled constant up front), and the read
  * layer RE-CENTERS the integer sums to the canonical batch pivot via
  * the exact binomial shift — pure BIGINT algebra, so the JB finish
  * then walks an IEEE chain IDENTICAL to the batch operator's
  * (bit-for-bit parity, not approximate; the parity spec's assertion).
  *
  * State per group is FIVE longs — the smallest state in the
  * streaming deck after [[PropStream]]; the caller's grid contract is
  * Σ(x−pivot)⁴ < 2⁶³ per group (the batch operator's DECIMAL(38,0)
  * documents the same class of bound). Stale rows (seq ≤ last seen)
  * are dropped under the [[EwmaStream]] ordering contract, so replays
  * and duplicate deliveries never double-count. */
object MomentsStream {

  case class MomentEvent(g: String, seq: Long, x: Long)
  case class MomentState(n: Long, t1: Long, t2: Long, t3: Long, t4: Long,
      lastSeq: Long)
  case class MomentSnapshot(g: String, n: Long, t1: Long, t2: Long,
      t3: Long, t4: Long)

  /** Per-group power-sum changelog around the fixed `pivot`. */
  def momentStream(events: Dataset[MomentEvent], pivot: Long)
      : Dataset[MomentSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.g)
      .flatMapGroupsWithState[MomentState, MomentSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g, rows, state) =>
          var st = state.getOption
            .getOrElse(MomentState(0L, 0L, 0L, 0L, 0L, Long.MinValue))
          var touched = false
          rows.toSeq.sortBy(_.seq).foreach { e =>
            if (e.seq > st.lastSeq) {
              val d = e.x - pivot
              st = MomentState(st.n + 1L, st.t1 + d, st.t2 + d * d,
                st.t3 + d * d * d, st.t4 + d * d * d * d, e.seq)
              touched = true
            }
          }
          state.update(st)
          if (touched)
            Iterator.single(MomentSnapshot(g, st.n, st.t1, st.t2, st.t3,
              st.t4))
          else Iterator.empty
      }
  }

  /** Read layer: re-center a compacted snapshot frame (g, n, t1..t4 at
    * `pivot`) to the canonical batch pivot c* = ⌊Σx/n⌋ with the exact
    * integer binomial shift, then run the SHARED batch finish. Output
    * schema ≡ [[JarqueBera.jarqueBera]]. */
  def jbFromSnapshots(snapshots: DataFrame, pivot: Long): DataFrame =
    JarqueBera.finishFromSums(snapshots
      // Σx ≥ 0 for the supported domains, so BIGINT div is the floor
      // division the batch pivot uses
      .withColumn("cstar", expr(s"(n * $pivot + t1) div n"))
      .withColumn("delta", expr(s"cstar - $pivot"))
      .selectExpr("g", "n",
        "t1 - n * delta AS t1n",
        "CAST(t2 AS DECIMAL(38,0)) - 2 * delta * t1" +
          " + CAST(n AS DECIMAL(38,0)) * delta * delta AS t2n",
        "CAST(t3 AS DECIMAL(38,0)) - 3 * delta * CAST(t2 AS DECIMAL(38,0))" +
          " + 3 * CAST(delta AS DECIMAL(38,0)) * delta * t1" +
          " - CAST(n AS DECIMAL(38,0)) * delta * delta * delta AS t3n",
        "CAST(t4 AS DECIMAL(38,0)) - 4 * delta * CAST(t3 AS DECIMAL(38,0))" +
          " + 6 * CAST(delta AS DECIMAL(38,0)) * delta * t2" +
          " - 4 * CAST(delta AS DECIMAL(38,0)) * delta * delta * t1" +
          " + CAST(n AS DECIMAL(38,0)) * delta * delta * delta * delta" +
          " AS t4n")
      .selectExpr("g", "n", "t1n AS t1", "t2n AS t2", "t3n AS t3",
        "t4n AS t4"))
}
