package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.expressions.KmvBuffer

/** Streaming KMV — the continuous twin of [[graft.operators.Kmv]]
  * with BOUNDED state: k sorted distinct longs per group forever (2 KiB
  * at k = 256), regardless of stream length or key cardinality. Like
  * the HLL twin (18v) and unlike the additive CountMin/DDSketch twins,
  * the state is ORDER-FREE MERGEABLE **and redelivery-idempotent**
  * (insert dedups — re-seeing a kept hash is a no-op, re-seeing a
  * dropped one re-loses), so at-least-once delivery gets exactly-once
  * estimates for free. What this twin adds over 18v: the state IS a
  * live uniform sample of the distinct keys seen so far — a streaming
  * distinct-population sample HLL registers cannot provide.
  *
  * The hash/insert/estimate program is the batch one verbatim on JVM
  * primitives (same md5-derived hash48, same [[KmvBuffer]] class the
  * batch aggregate runs inside executors, same pinned 255·2⁴⁸
  * estimate literal), so a replay of any frame equals the batch
  * sketch EXACTLY — spec-pinned against q264's program. */
object KmvStream {

  case class KeyEvent(g: String, k: String)
  case class KmvState(vs: Array[Long])
  /** sz/hk/est mirror the batch [[graft.operators.Kmv.bottomK]] frame;
    * hs is the live distinct-key sample (ascending hashes). */
  case class KmvEstimate(g: String, sz: Long, hk: Long, kmv_est: Double,
      hs: Seq[Long])

  private val K = graft.operators.Kmv.K
  private val EstNum = 7.177611906121728e16 // Kmv.EstNum pinned

  private[streaming] def hash48(key: String): Long =
    java.lang.Long.parseLong(
      graft.functions.Hashing.md5hex(key).substring(0, 12), 16)

  private[streaming] def estimateOf(buf: KmvBuffer): (Long, Long, Double) =
    if (buf.size < buf.k) (buf.size.toLong, -1L, buf.size.toDouble)
    else {
      val hk = buf.vs(buf.k - 1)
      (buf.size.toLong, hk, EstNum / (hk.toDouble + 1.0))
    }

  /** Per-group running distinct estimate + live distinct-key sample,
    * refreshed each trigger (Update mode). */
  def kmvStream(events: Dataset[KeyEvent]): Dataset[KmvEstimate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.g)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (g: String, rows: Iterator[KeyEvent], state: GroupState[KmvState]) => {
          val buf = new KmvBuffer(K)
          state.getOption.foreach { s =>
            var i = 0
            // stored ascending distinct: straight re-fill
            while (i < s.vs.length) { buf.vs(i) = s.vs(i); i += 1 }
            buf.size = s.vs.length
          }
          rows.foreach(r => buf.insert(hash48(r.k)))
          state.update(KmvState(
            java.util.Arrays.copyOfRange(buf.vs, 0, buf.size)))
          val (sz, hk, est) = estimateOf(buf)
          Iterator(KmvEstimate(g, sz, hk, est,
            java.util.Arrays.copyOfRange(buf.vs, 0, buf.size).toSeq))
        })
  }
}
