package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SequentialStream
import graft.streaming.SequentialStream.ObfEvent

/** 18w: streaming OBF monitor parity with batch q153 under a
  * scrambled replay (the LateStream contract), with the planned
  * information set to the realized total so the boundary matches the
  * batch computation exactly. */
object SequentialStreamSpec {
  // top-level so the closures shipped into flatMapGroupsWithState
  // don't capture the (non-serializable) suite instance
  val yearEndMs: Int => Long = y =>
    if (y >= 9999) Long.MaxValue / 2
    else java.time.LocalDate.of(y + 1, 1, 1).toEpochDay * 86400000L
  val thirtyDayLooks: Int => Long = lk => lk * 30L * 86400000L
}

class SequentialStreamSpec extends AnyFunSuite {
  import SequentialStreamSpec.{thirtyDayLooks, yearEndMs}
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("scrambled replay emits the batch q153 look rows exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val batch = operators.Sequential.orderFinishMonitor(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(r.fieldIndex("z")),
        r.getDouble(r.fieldIndex("bound")), r.getBoolean(r.fieldIndex("crossed")),
        r.getBoolean(r.fieldIndex("is_decision")))))
      .toMap
    val feed = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_orderstatus").isNotNull)
      .selectExpr("CAST(o_orderdate AS DATE) AS d",
        "year(CAST(o_orderdate AS DATE)) AS look",
        s"CAST(hash48(concat('${operators.Sequential.Seed}:'," +
          " CAST(o_orderkey AS STRING))) % 2 AS INT) AS t",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS conv")
      .collect()
      .map(r => ObfEvent(
        new Timestamp(r.getDate(0).toLocalDate.toEpochDay * 86400000L),
        r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(_.ts.getTime)
    val planned = feed.length.toLong
    // bounded scramble: 4 chunks, shuffled, suffix carried forward
    val chunks = feed.grouped(math.max(1, (feed.length + 3) / 4)).toSeq
    val delayMs = chunks.map(c => c.last.ts.getTime - c.head.ts.getTime).max + 1000L
    val rnd = new scala.util.Random(31)
    val batches = scala.collection.mutable.ArrayBuffer.fill(
      chunks.length)(List.empty[ObfEvent])
    chunks.zipWithIndex.foreach { case (ch, i) =>
      val (stay, moved) = ch.splitAt(math.max(1, ch.length - 8))
      batches(i) = batches(i) ++ stay
      batches(math.min(i + 1, chunks.length - 1)) =
        batches(math.min(i + 1, chunks.length - 1)) ++ moved
    }
    val input = MemoryStream[ObfEvent]
    val q = SequentialStream.obfStream(input.toDS(), planned, yearEndMs,
        watermark = s"$delayMs milliseconds").writeStream
      .format("memory").queryName("obf_looks").outputMode("append").start()
    try {
      batches.foreach { b => input.addData(rnd.shuffle(b).toSeq); q.processAllAvailable() }
      val flushTs = feed.map(_.ts.getTime).max + 4 * delayMs
      for (i <- 0 to 1) {
        input.addData(Seq(ObfEvent(
          new Timestamp(flushTs + i * delayMs), 9999, 0, 0)))
        q.processAllAvailable()
      }
      val got = spark.table("obf_looks").collect()
        .filter(_.getInt(0) != 9999)
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
          r.getBoolean(8), r.getBoolean(9))))
        .toMap
      assert(got.keySet == batch.keySet,
        s"looks ${got.keySet} vs batch ${batch.keySet}")
      got.foreach { case (lk, row) =>
        assert(row == batch(lk), s"look $lk: stream $row vs batch ${batch(lk)}")
      }
    } finally q.stop()
  }

  test("a planted crossing decides exactly once, at the closing of its look") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ev(day: Long, look: Int, t: Int, conv: Int) =
      ObfEvent(new Timestamp(day * 86400000L), look, t, conv)
    // look 1: balanced; look 2: extreme split — crosses at its close
    val look1 = (1 to 200).map(i => ev(10, 1, i % 2, i % 4 / 2))
    val look2 = (1 to 200).map(i => ev(40, 2, i % 2, i % 2)) // arm b all-convert
    val input = MemoryStream[ObfEvent]
    val q = SequentialStream.obfStream(input.toDS(), 400L,
        thirtyDayLooks, watermark = "1 day").writeStream
      .format("memory").queryName("obf_planted").outputMode("append").start()
    try {
      input.addData(look1 ++ look2); q.processAllAvailable()
      for (i <- 0 to 1) {
        input.addData(Seq(ev(1000 + i * 10, 99, 0, 0))); q.processAllAvailable()
      }
      val rows = spark.table("obf_planted").collect()
        .filter(_.getInt(0) != 99).sortBy(_.getInt(0))
      assert(rows.length == 2)
      assert(!rows(0).getBoolean(rows(0).fieldIndex("crossed")))
      assert(rows(1).getBoolean(rows(1).fieldIndex("crossed")))
      assert(rows(1).getBoolean(rows(1).fieldIndex("is_decision")))
    } finally q.stop()
  }
}
