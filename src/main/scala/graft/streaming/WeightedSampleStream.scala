package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.WeightedSample

/** Streaming weighted sampling without replacement — the continuous
  * twin of q160, and not an adaptation but the ALGORITHM'S OWN
  * streaming form: Efraimidis–Spirakis is literally reservoir
  * algorithm A-Res ("keep the k largest keys u^(1/w) seen so far"), so
  * the batch election and the stream reservoir compute the SAME set by
  * construction. The key is a pure function of the row
  * ([[WeightedSample.keyedEs]] runs unchanged on the streaming frame),
  * the top-k order is the same SQL total order the s18 aggregate uses
  * (es DESC, id ASC — NaN-greatest, the r12 TopK convention), and the
  * election is order-free — so ANY replay order, any micro-batching,
  * converges to exactly the batch q160 rows (spec-verified).
  *
  * State per domain is the BOUNDED k-entry reservoir (es, id, w) —
  * constant regardless of stream length; each trigger emits the
  * domain's current elected set with dense ranks (Update mode). */
object WeightedSampleStream {

  case class KeyedRow(g: String, id: Long, w: Long, es: Double)
  case class Reservoir(entries: Seq[(Double, Long, Long)])
  case class Elected(g: String, id: Long, w: Long, rk: Int)

  /** Stateless front end: the q160 key chain over a (possibly
    * streaming) frame with (domainCol, keyCol, weightCol). */
  def keyedStream(df: DataFrame, domainCol: String, keyCol: String,
      weightCol: String): Dataset[KeyedRow] = {
    import df.sparkSession.implicits._
    WeightedSample.keyedEs(df, domainCol, keyCol, weightCol)
      .select("g", "id", "w", "es").as[KeyedRow]
  }

  /** The s18/TopKBuffer election order (SQL total order: score desc,
    * NaN greatest, ±0.0 equal; id asc tie-break). */
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = if (s1 == s2) 0 else java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  /** Per-domain bounded A-Res reservoir; emits the full current
    * elected set (with ranks 1..≤k) every trigger. */
  def weightedSample(rows: Dataset[KeyedRow], k: Int = WeightedSample.K)
      : Dataset[Elected] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_.g)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (g: String, it: Iterator[KeyedRow], state: GroupState[Reservoir]) => {
          var buf = state.getOption.map(_.entries.toVector)
            .getOrElse(Vector.empty[(Double, Long, Long)])
          it.foreach { r =>
            // id-dedup makes redelivery idempotent (at-least-once
            // sources): the key is a pure function of the row, so a
            // replayed id carries the identical es and re-inserting
            // it could only duplicate the entry
            if (!buf.exists(_._2 == r.id) &&
              (buf.size < k || better(r.es, r.id, buf.last._1, buf.last._2))) {
              val i = buf.indexWhere(e => better(r.es, r.id, e._1, e._2))
              val at = if (i < 0) buf.size else i
              buf = (buf.take(at) :+ ((r.es, r.id, r.w))) ++ buf.drop(at)
              if (buf.size > k) buf = buf.take(k)
            }
          }
          state.update(Reservoir(buf))
          buf.iterator.zipWithIndex.map { case ((_, id, w), p) =>
            Elected(g, id, w, p + 1)
          }
        })
  }
}
