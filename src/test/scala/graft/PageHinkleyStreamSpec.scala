package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import streaming.PageHinkleyStream
import streaming.PageHinkleyStream.{PhEvent, PhState}

/** Streaming PH twin of q226 (18aa): the stream's final snapshot
  * equals the reference online fold EXACTLY (same step function, same
  * order contract) under ordered, multi-batch, and duplicate-delivery
  * replays; a planted level shift raises PH⁺ past λ; series are
  * independent. */
class PageHinkleyStreamSpec extends AnyFunSuite {
  lazy val spark = Engine.session()

  private def refFold(xs: Seq[Double]): PhState =
    xs.zipWithIndex.foldLeft(PageHinkleyStream.InitState) {
      case (st, (x, i)) => PageHinkleyStream.step(st, x, i.toLong)
    }

  private def runStream(batches: Seq[Seq[PhEvent]], name: String) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[PhEvent]
    val q = PageHinkleyStream.phStream(input.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).collect()
        .groupBy(_.getLong(0))
        .map { case (g, rows) => g -> rows.maxBy(_.getLong(1)) }
    } finally q.stop()
  }

  private val shifted: Seq[Double] =
    Seq.fill(20)(10.0) ++ Seq.fill(20)(20.0)

  test("multi-batch ordered replay equals the reference fold exactly") {
    val events = shifted.zipWithIndex.map { case (x, i) =>
      PhEvent(1L, i.toLong, x) }
    val out = runStream(events.grouped(7).map(_.toSeq).toSeq, "ph_ordered")
    val ref = refFold(shifted)
    val (up, dn) = PageHinkleyStream.phOf(ref)
    val row = out(1L)
    assert(row.getLong(2) == 40L)
    assert(row.getDouble(3) == up)
    assert(row.getDouble(4) == dn)
  }

  test("duplicate deliveries never double-count (seq contract)") {
    val events = shifted.zipWithIndex.map { case (x, i) =>
      PhEvent(1L, i.toLong, x) }
    val out = runStream(
      Seq(events.take(25), events.take(25), events), "ph_dup")
    val ref = refFold(shifted)
    assert(out(1L).getLong(2) == 40L)
    assert(out(1L).getDouble(3) == PageHinkleyStream.phOf(ref)._1)
  }

  test("a planted upward shift alarms: PH⁺ exceeds any sane λ") {
    val (up, dn) = PageHinkleyStream.phOf(refFold(shifted))
    // 20 post-shift points at +10 against a lagging mean accumulate
    // ~Σ(10·k/(20+k)) ≈ 64 of drawup — far beyond a λ ~ 3·σ band
    assert(up > 30.0)
    assert(dn == 0.0)
    // and the mirrored shift mirrors the sides
    val (u2, d2) = PageHinkleyStream.phOf(
      refFold(Seq.fill(20)(20.0) ++ Seq.fill(20)(10.0)))
    assert(d2 > 30.0 && u2 == 0.0)
  }

  test("series are keyed independently") {
    val a = shifted.zipWithIndex.map { case (x, i) => PhEvent(1L, i.toLong, x) }
    val b = (0 until 40).map(i => PhEvent(2L, i.toLong, 5.0))
    val out = runStream(Seq(a ++ b), "ph_multi")
    assert(out(1L).getDouble(3) > 30.0)
    assert(out(2L).getDouble(3) == 0.0)
  }
}
