package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.DdSketch

/** Streaming DDSketch — the continuous twin of
  * [[graft.operators.DdSketch]] (q260), completing the sketch deck's
  * streaming symmetry (18w HLL, CMS, now quantiles): per group the
  * state is the log-bucket count map — bounded by the VALUE RANGE
  * (≈ B·log₂(max/min) entries, ~300 for any price/latency domain),
  * never by stream length — and each trigger re-emits the current
  * quantile readout per requested p (Update mode).
  *
  * Delivery contract: bucket counts ADD (order-free mergeable, so NO
  * ordering contract — but unlike the HLL twin's idempotent max,
  * addition double-counts duplicate redelivery; feed exactly-once or
  * dedup upstream, the CountMin twin's contract).
  *
  * The bucket/estimate program is the batch one verbatim on JVM
  * primitives — the same 1e-9 ln snap, the same B/ln2 multiplier, the
  * same exact power-of-two × pinned-root estimate — so a replay of
  * any frame equals the batch [[DdSketch.quantiles]] readout EXACTLY
  * (DdSketchStreamSpec pins frame equality against q260's machinery).
  */
object DdSketchStream {

  case class ValueEvent(g: String, x: Double)
  case class SketchState(counts: Map[Long, Long])
  /** Same shape as the batch quantile readout (pre-join columns). */
  case class QuantileEstimate(g: String, p: Double, n: Long, i: Long,
      est: Double)

  /** Batch [[DdSketch.bucketOf]] on JVM primitives. */
  private[graft] def bucketOf(x: Double): Long = {
    val snap = math.floor(math.log(x) * 1e9 + 0.5) / 1e9
    math.max(math.ceil(snap * DdSketch.IdxMul).toLong, 1L)
  }

  /** Batch [[DdSketch.estimateOf]] on JVM primitives. */
  private[graft] def estimateOf(i: Long): Double = {
    val e = 2L * i - 1L
    val twoB = 2L * DdSketch.SubBuckets
    math.pow(2.0, (e / twoB).toDouble) * DdSketch.Roots((e % twoB).toInt)
  }

  /** Batch quantile rule on the state map: smallest bucket whose
    * cumulative count reaches ⌈p·n⌉. */
  private[graft] def quantilesOf(g: String, counts: Map[Long, Long],
      ps: Seq[Double]): Seq[QuantileEstimate] = {
    val n = counts.valuesIterator.sum
    val sorted = counts.toSeq.sortBy(_._1)
    ps.map { p =>
      val r = math.ceil(p * n).toLong
      var cum = 0L
      val i = sorted.find { case (_, c) => cum += c; cum >= r }
        .map(_._1).getOrElse(sorted.last._1)
      QuantileEstimate(g, p, n, i, estimateOf(i))
    }
  }

  /** Per-group running quantile estimates, refreshed each trigger. */
  def ddSketchStream(events: Dataset[ValueEvent],
      ps: Seq[Double] = DdSketch.Ps): Dataset[QuantileEstimate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.g)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (g: String, rows: Iterator[ValueEvent], state: GroupState[SketchState]) => {
          var counts = state.getOption.map(_.counts).getOrElse(Map.empty[Long, Long])
          rows.foreach { r =>
            val b = bucketOf(r.x)
            counts = counts.updated(b, counts.getOrElse(b, 0L) + 1L)
          }
          state.update(SketchState(counts))
          quantilesOf(g, counts, ps).iterator
        })
  }
}
