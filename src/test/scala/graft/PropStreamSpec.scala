package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import streaming.PropStream
import streaming.PropStream.PropEvent

class PropStreamSpec extends AnyFunSuite {
  lazy val spark = Engine.session()

  test("compacted changelog + propZTest equals batch q132 on a full replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batch = operators.PropTest.purchaseRateTest(spark, dir).collect().head
    val feed = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        (col("event_type") === "purchase").as("s"))
      .collect()
      .map(r => PropEvent(r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_.seq)
    val input = MemoryStream[PropEvent]
    val q = PropStream.convStream(input.toDS()).writeStream
      .format("memory").queryName("conv_log").outputMode("append").start()
    try {
      feed.grouped(math.max(1, feed.length / 3)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      val compacted = spark.table("conv_log")
        .withColumn("rk", expr(
          "row_number() OVER (PARTITION BY u ORDER BY n_events DESC)"))
        .filter(col("rk") === 1)
        .select(col("u"), col("conv"))
      val live = operators.PropTest.propZTest(compacted).collect().head
      assert(live.toSeq == batch.toSeq,
        "live z from the compacted changelog must equal the batch q132 row")
    } finally q.stop()
  }

  test("snapshots flip as the threshold crosses; stale rows dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[PropEvent]
    val q = PropStream.convStream(input.toDS(), mult = 2L).writeStream
      .format("memory").queryName("conv_small").outputMode("append").start()
    try {
      input.addData(PropEvent(1L, 1L, true)); q.processAllAvailable()
      // 2*1 > 1 → heavy
      input.addData(PropEvent(1L, 2L, false), PropEvent(1L, 3L, false))
      q.processAllAvailable()
      // 2*1 > 3 false → flipped off; stale seq ignored
      input.addData(PropEvent(1L, 2L, true)); q.processAllAvailable()
      val rows = spark.table("conv_small").collect()
        .map(r => (r.getLong(1), r.getInt(2))).toSeq.sortBy(_._1)
      assert(rows == Seq((1L, 1), (3L, 0)))
    } finally q.stop()
  }
}
