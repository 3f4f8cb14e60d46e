package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming distribution-drift detector — the continuous twin of the
  * q99 two-sample Kolmogorov–Smirnov test (and the hypothesis-layer
  * upgrade of q86's marginal profile drift): each event-time window's
  * value distribution is tested against a fixed baseline the moment
  * the watermark closes the window, emitting one alert row per window
  * with the exact D statistic and its asymptotic z.
  *
  * Semantics contract: an emitted (d_stat, ks_z) is EQUAL to what
  * [[graft.operators.Hypothesis.ksTest]] returns for the same window
  * rows against the baseline expanded to rows (same exact-BIGINT
  * supremum max|c1·n2 − c2·n1|, same one division, same rounding) —
  * asserted by the parity spec.
  *
  * State design: one map (distinct value → count) per OPEN window —
  * bounded by value cardinality × open-window count, never by row
  * count (quantize continuous measures first, q47, exactly as the
  * batch test requires). The baseline is a driver-side cell map:
  * dimension-grade by the same precondition. Event-time timeout fires
  * once the watermark passes the window end, so every window emits
  * exactly once and its state is dropped — indefinitely-running safe.
  */
object DriftStream {

  case class DriftEvent(ts: Timestamp, v: Double)
  case class DriftState(counts: Map[Double, Long], windowEnd: Long)
  case class DriftAlert(window_start: Timestamp, n_window: Long,
      d_stat: Double, ks_z: Double)

  /** Exact two-sample KS over two cell maps (value → count) — the
    * q99 arithmetic in driver/executor Scala: cumulative counts over
    * the sorted pooled support, D-numerator max|c1·n2 − c2·n1| exact
    * in Long (precondition n1·n2 < 2^63), one division at the end.
    * Returns (d_stat round-6, ks_z round-4), matching the batch
    * operator's output grid. */
  def ksOfCells(x: Map[Double, Long], y: Map[Double, Long]): (Double, Double) = {
    val n1 = x.values.sum
    val n2 = y.values.sum
    require(n1 > 0 && n2 > 0, "ksOfCells needs non-empty samples on both sides")
    var c1 = 0L; var c2 = 0L; var dnum = 0L
    (x.keySet ++ y.keySet).toSeq.sorted.foreach { v =>
      c1 += x.getOrElse(v, 0L)
      c2 += y.getOrElse(v, 0L)
      dnum = math.max(dnum, math.abs(c1 * n2 - c2 * n1))
    }
    val d = dnum.toDouble / (n1.toDouble * n2.toDouble)
    val z = d * math.sqrt(n1.toDouble * n2.toDouble / (n1.toDouble + n2.toDouble))
    // HALF_UP like Spark's round(), so the parity contract is exact
    def r(v: Double, s: Int) =
      BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    (r(d, 6), r(z, 4))
  }

  /** KS drift alerts per tumbling event-time window. Input: streaming
    * frame with (ts TIMESTAMP, v DOUBLE) — project upstream. Output
    * (append): one row per CLOSED window (window_start, n_window,
    * d_stat, ks_z). `baseline` is the reference distribution as
    * value-level cells, e.g. `df.groupBy(v).count()` collected from a
    * trusted historical snapshot. */
  def ksDriftStream(events: DataFrame, baseline: Map[Double, Long],
      windowMs: Long = 3600000L,
      watermark: String = "10 minutes"): Dataset[DriftAlert] = {
    require(baseline.nonEmpty, "baseline cells must be non-empty")
    require(baseline.values.forall(_ > 0), "baseline counts must be positive")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("v"))
      .as[DriftEvent]
      .groupByKey(e => e.ts.getTime / windowMs * windowMs)
      .flatMapGroupsWithState[DriftState, DriftAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (winStart, rows, state) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            val (d, z) = ksOfCells(st.counts, baseline)
            Iterator.single(
              DriftAlert(new Timestamp(winStart), st.counts.values.sum, d, z))
          } else {
            val st = state.getOption
              .getOrElse(DriftState(Map.empty, winStart + windowMs))
            val counts = rows.foldLeft(st.counts) { (m, e) =>
              m.updated(e.v, m.getOrElse(e.v, 0L) + 1L)
            }
            state.update(DriftState(counts, st.windowEnd))
            // fire when the watermark passes the window end (timeout
            // must sit strictly above the current watermark)
            state.setTimeoutTimestamp(
              math.max(st.windowEnd, state.getCurrentWatermarkMs + 1))
            Iterator.empty
          }
      }
  }
}
