package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{DriftStream, LateStream}
import graft.streaming.DriftStream.CusumEvent
import graft.streaming.LateStream.{TrendLateEvent, TwapLateEvent}

/** r11 (r10 verdict #4): the watermark-buffered twins must reproduce
  * the batch rows exactly from SCRAMBLED micro-batches — disorder both
  * within each batch and across batch boundaries, bounded by the
  * watermark horizon (the contract real reordered Kafka feeds meet).
  */
class LateStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  /** Deterministic bounded scramble: cut the ts-sorted feed into
    * `nChunks` contiguous chunks, demote the last `carry` rows of
    * each chunk into the next (cross-boundary lateness), then shuffle
    * every batch (in-batch disorder). Returns (batches, safe
    * watermark delay ms = max chunk time-span + 1s ≥ any lateness). */
  private def scramble[E](sorted: Seq[E], tsOf: E => Long, nChunks: Int,
      carry: Int, seed: Int): (Seq[Seq[E]], Long) = {
    val chunks = sorted.grouped(
      math.max(1, (sorted.length + nChunks - 1) / nChunks)).toSeq
    val spanMs = chunks.map(c => tsOf(c.last) - tsOf(c.head)).max + 1000L
    val rnd = new scala.util.Random(seed)
    val batches = scala.collection.mutable.ArrayBuffer.fill(
      chunks.length)(List.empty[E])
    chunks.zipWithIndex.foreach { case (c, i) =>
      val (stay, moved) = c.splitAt(math.max(1, c.length - carry))
      batches(i) = batches(i) ++ stay
      val dest = math.min(i + 1, chunks.length - 1)
      batches(dest) = batches(dest) ++ moved
    }
    (batches.map(b => rnd.shuffle(b)).toSeq, spanMs)
  }

  test("cusumStreamLate: scrambled replay equals the batch q105 alarm set") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val (t, k, h) = (5000L, 1500L, 20000L)
    val batch = operators.Changepoint.cusum(
      Tables.events(spark, dir), "event_type", "ts", "event_id",
      "value", t, k, h)
      .filter(col("alarm"))
      .collect()
      .map(r => (r.getString(0), r.getLong(r.fieldIndex("tie"))) ->
        (r.getLong(r.fieldIndex("s_up")), r.getLong(r.fieldIndex("s_dn")),
          r.getString(r.fieldIndex("dir"))))
      .toMap
    val feed = Tables.events(spark, dir)
      .select(col("ts"), col("event_type"), col("event_id"), col("value"))
      .collect()
      .map(r => CusumEvent(r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(e => (e.ts.getTime, e.seq))
    val (batches, delayMs) = scramble[CusumEvent](
      feed, _.ts.getTime, nChunks = 4, carry = 8, seed = 7)
    val input = MemoryStream[CusumEvent]
    val q = LateStream.cusumStreamLate(input.toDS(), t, k, h,
        s"$delayMs milliseconds").writeStream
      .format("memory").queryName("cusum_late_alarms")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      // two flush sentinels on a throwaway key: the first advances the
      // watermark past everything, the second runs a batch under it
      val flushTs = feed.map(_.ts.getTime).max + 4 * delayMs
      for (i <- 0 to 1) {
        input.addData(Seq(CusumEvent(
          new Timestamp(flushTs + i * delayMs), "__flush", i.toLong, 0.0)))
        q.processAllAvailable()
      }
      val got = spark.table("cusum_late_alarms").collect()
        .filter(_.getString(0) != "__flush")
        .map(r => (r.getString(0), r.getLong(r.fieldIndex("seq"))) ->
          (math.round(r.getDouble(r.fieldIndex("s_up")) * 100),
            math.round(r.getDouble(r.fieldIndex("s_dn")) * 100),
            r.getString(r.fieldIndex("dir"))))
        .toMap
      assert(got.size == batch.size,
        s"alarm count ${got.size} != batch ${batch.size}")
      assert(got == batch, "scrambled-replay alarms must equal batch")
    } finally q.stop()
  }

  test("twapStreamLate: scrambled replay equals the batch q113 rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val batch = operators.Twap.userTwap(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap
    val feed = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .selectExpr("user_id", "ts", "unix_micros(ts) AS us", "event_id",
        "value")
      .collect()
      .map(r => TwapLateEvent(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
      .sortBy(e => (e.us, e.tie))
    val (batches, delayMs) = scramble[TwapLateEvent](
      feed, _.ts.getTime, nChunks = 4, carry = 8, seed = 11)
    val input = MemoryStream[TwapLateEvent]
    val q = LateStream.twapStreamLate(input.toDS(),
        s"$delayMs milliseconds").writeStream
      .format("memory").queryName("twap_late_rows")
      .outputMode("update").start()
    try {
      batches.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      val flushTs = feed.map(_.ts.getTime).max + 4 * delayMs
      for (i <- 0 to 1) {
        input.addData(Seq(TwapLateEvent(-1L,
          new Timestamp(flushTs + i * delayMs),
          (flushTs + i * delayMs) * 1000L, i.toLong, 0.0)))
        q.processAllAvailable()
      }
      val got = spark.table("twap_late_rows").collect()
        .filter(_.getLong(0) >= 0L)
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
        .groupBy(_._1).map { case (u, rs) =>
          u -> rs.map(_._2).maxBy(_._1) // most events = final state
        }
      assert(got.keySet == batch.keySet)
      got.foreach { case (u, row) =>
        assert(row == batch(u), s"user $u: late $row vs batch ${batch(u)}")
      }
    } finally q.stop()
  }

  test("mkTrendStreamLate: scrambled replay equals the batch q143 rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val batch = operators.MannKendall.orderRevenueTrend(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5))))
      .toMap
    // day cells carrying the bucket's end-of-day instant for the
    // watermark (day d closes at (d+1)·86400s)
    val feed = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull
        && col("o_orderpriority").isNotNull)
      .groupBy(col("o_orderpriority").as("g"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')" +
          " AS BIGINT)").as("day"))
      .agg(expr("CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT))" +
        " AS BIGINT)").as("xc"))
      .collect()
      .map(r => TrendLateEvent(r.getString(0),
        new Timestamp((r.getLong(1) + 1) * 86400000L), r.getLong(1),
        r.getLong(2)))
      .sortBy(_.day)
    val (batches, delayMs) = scramble[TrendLateEvent](
      feed, _.ts.getTime, nChunks = 4, carry = 6, seed = 13)
    val input = MemoryStream[TrendLateEvent]
    val q = LateStream.mkTrendStreamLate(input.toDS(),
        s"$delayMs milliseconds").writeStream
      .format("memory").queryName("mk_late_rows")
      .outputMode("update").start()
    try {
      batches.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      val flushTs = feed.map(_.ts.getTime).max + 4 * delayMs
      for (i <- 0 to 1) {
        input.addData(Seq(TrendLateEvent("__flush",
          new Timestamp(flushTs + i * delayMs), i.toLong, 0L)))
        q.processAllAvailable()
      }
      val got = spark.table("mk_late_rows").collect()
        .filter(_.getString(0) != "__flush")
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getString(5))))
        .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).maxBy(_._1) }
      assert(got.keySet == batch.keySet)
      got.foreach { case (g, row) =>
        assert(row == batch(g), s"$g: late $row vs batch ${batch(g)}")
      }
    } finally q.stop()
  }
}
