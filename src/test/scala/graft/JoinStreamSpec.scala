package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import streaming.JoinStream

object JoinStreamSpec {
  case class Imp(user_id: Long, event_id: Long, ts: Timestamp)
  case class Conv(c_user_id: Long, conv_id: Long, value: Double, cts: Timestamp)
}

/** The watermarked stream-stream join: replay-equivalence vs the batch
  * twin (the SAME function on batch frames), plus the two contracts
  * that make it runnable forever — bounded state via the time-range
  * condition and late-row dropping past the watermark. */
class JoinStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  private val dir = "/root/testdata/sf0.001"

  import JoinStreamSpec.{Imp, Conv}

  private def key(r: org.apache.spark.sql.Row): (Long, Long, Long) =
    (r.getLong(r.fieldIndex("user_id")), r.getLong(r.fieldIndex("event_id")),
      r.getLong(r.fieldIndex("conv_id")))

  test("interleaved two-stream replay ≡ the batch twin, exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val impsB = JoinStream.impressionsOf(events)
    val convsB = JoinStream.conversionsOf(events)
    val want = JoinStream.attributionJoin(impsB, convsB)
      .filter(col("conv_id") =!= col("event_id"))
      .collect().map(key).toSet
    assert(want.size > 20, s"batch twin too small to be probative: ${want.size}")

    val impRows = impsB.as[Imp].collect().sortBy(_.ts.getTime)
    val convRows = convsB.as[Conv].collect().sortBy(_.cts.getTime)
    val iIn = MemoryStream[Imp]; val cIn = MemoryStream[Conv]
    val q = JoinStream.attributionJoin(iIn.toDF(), cIn.toDF())
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    val got =
      try {
        // both feeds advance in global event-time order, five chunks
        // each, interleaved — each side's watermark advances between
        // micro-batches while the other side still has matches coming
        val iChunks = impRows.grouped(math.max(1, impRows.length / 5)).toSeq
        val cChunks = convRows.grouped(math.max(1, convRows.length / 5)).toSeq
        (0 until math.max(iChunks.length, cChunks.length)).foreach { k =>
          if (k < iChunks.length) iIn.addData(iChunks(k).toSeq)
          if (k < cChunks.length) cIn.addData(cChunks(k).toSeq)
          q.processAllAvailable()
        }
        spark.table("ssjoin")
          .filter(col("conv_id") =!= col("event_id"))
          .collect().map(key).toSet
      } finally q.stop()
    assert(got == want,
      s"stream ${got.size} pairs vs batch ${want.size}; " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("q311: the registered replay row reproduces its own batch twin") {
    // the driver hash-checks this against DuckDB; here pin the same
    // contract in-suite so a replay regression fails fast
    val got = JoinStream.replayAttribution(spark, dir)
      .collect().map(key).toSet
    val events = Tables.events(spark, dir)
    val want = JoinStream.attributionJoin(
        JoinStream.impressionsOf(events), JoinStream.conversionsOf(events))
      .filter(col("conv_id") =!= col("event_id"))
      .collect().map(key).toSet
    assert(got == want, s"replay ${got.size} vs batch ${want.size}")
    assert(got.nonEmpty)
  }

  test("a row older than the watermark on arrival is dropped, not joined") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val iIn = MemoryStream[Imp]; val cIn = MemoryStream[Conv]
    val q = JoinStream.attributionJoin(iIn.toDF(), cIn.toDF(),
        watermark = "10 minutes", horizon = "1 hour")
      .writeStream.format("memory").queryName("ssjoin_late")
      .outputMode("append").start()
    try {
      iIn.addData(Imp(1L, 10L, ts(0)))
      cIn.addData(Conv(1L, 90L, 1.0, ts(5)))
      q.processAllAvailable()
      // advance both watermarks far past the horizon
      iIn.addData(Imp(9L, 11L, ts(600)))
      cIn.addData(Conv(9L, 91L, 1.0, ts(600)))
      q.processAllAvailable()
      // late conversion inside user 1's window but behind the watermark
      cIn.addData(Conv(1L, 92L, 1.0, ts(6)))
      q.processAllAvailable()
      val got = spark.table("ssjoin_late").collect()
        .map(r => r.getLong(r.fieldIndex("conv_id"))).toSet
      assert(got.contains(90L), "the on-time pair must be emitted")
      assert(!got.contains(92L), "a late row behind the watermark must drop")
    } finally q.stop()
  }

  test("the physical plan carries watermarks on BOTH sides (state is bounded)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val iIn = MemoryStream[Imp]; val cIn = MemoryStream[Conv]
    val joined = JoinStream.attributionJoin(iIn.toDF(), cIn.toDF())
    val plan = joined.queryExecution.analyzed.toString()
    assert("EventTimeWatermark".r.findAllIn(plan).size == 2,
      "both inputs must be watermarked or join state grows without bound")
  }
}
