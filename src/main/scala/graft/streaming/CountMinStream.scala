package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming count–min sketch — the continuous twin of
  * [[graft.operators.CountMin]] with BOUNDED state: ≤ d·w counter
  * cells per routing partition FOREVER (an exact term-frequency state
  * grows with vocabulary; the CMS state does not). Terms are routed
  * to partitions by term hash (the HeavyHittersStream pattern), so a
  * term's increments land in exactly ONE partition and the GLOBAL
  * sketch table is the per-(di, b) SUM of partition cells — the read
  * layer compacts the emitted changelog (max per partition cell:
  * totals are monotone) and sums across partitions, then the BATCH
  * probe ([[graft.operators.CountMin.estimates]]) runs unchanged on
  * the compacted table (the 18y read-layer idiom).
  *
  * Delivery contract: increments are additive — order-FREE (sums
  * commute, any replay order works) but NOT duplicate-idempotent,
  * the same contract as the Misra–Gries twin (18e); contrast 18v's
  * max-merged HLL registers, which are idempotent too. Exactly-once
  * sinks/sources (the Structured Streaming default with
  * checkpointing) satisfy it.
  *
  * Bucket hashing is the batch program on JVM primitives:
  * hash48(di:term) % w off the same md5 — a replay of any frame
  * compacts to the batch table EXACTLY (spec-pinned). */
object CountMinStream {

  case class TermEvent(part: Int, t: String)
  case class CmsState(cells: Map[Int, Long])
  /** One changelog row per TOUCHED cell per trigger. */
  case class CmsCell(part: Int, di: Int, b: Int, tot: Long)

  val D = graft.operators.CountMin.D
  val W = graft.operators.CountMin.W

  private[streaming] def bucket(di: Int, t: String): Int =
    (java.lang.Long.parseLong(
      graft.functions.Hashing.md5hex(s"$di:$t").substring(0, 12), 16)
      % W).toInt

  /** Per-partition CMS cell changelog (Update mode). */
  def cmsStream(events: Dataset[TermEvent]): Dataset[CmsCell] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.part)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (part: Int, rows: Iterator[TermEvent], state: GroupState[CmsState]) => {
          var cells = state.getOption.map(_.cells)
            .getOrElse(Map.empty[Int, Long])
          val touched = scala.collection.mutable.Set.empty[Int]
          rows.foreach { r =>
            (0 until D).foreach { di =>
              val key = di * W + bucket(di, r.t)
              cells = cells.updated(key, cells.getOrElse(key, 0L) + 1L)
              touched += key
            }
          }
          state.update(CmsState(cells))
          touched.iterator.map(k =>
            CmsCell(part, k / W, k % W, cells(k)))
        })
  }
}
