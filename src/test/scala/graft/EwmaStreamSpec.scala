package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import streaming.EwmaStream
import streaming.EwmaStream.EwmaEvent

class EwmaStreamSpec extends AnyFunSuite {
  lazy val spark = Engine.session()

  test("ordered replay: last emitted level per user equals batch q124 exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batch = operators.Ewma.userEwma(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val feed = Tables.events(spark, dir)
      .select(expr("unix_micros(ts)").as("tsUs"), col("user_id"),
        col("event_id"), col("value"))
      .collect()
      .map(r => EwmaEvent(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(e => (e.tsUs, e.seq))
    val input = MemoryStream[EwmaEvent]
    val q = EwmaStream.ewmaStream(input.toDS()).writeStream
      .format("memory").queryName("ewma_levels").outputMode("append").start()
    try {
      feed.grouped(math.max(1, feed.length / 4)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      // compacted-changelog read: the max-n_events snapshot per user
      val got = spark.table("ewma_levels")
        .withColumn("rk", expr(
          "row_number() OVER (PARTITION BY user ORDER BY n_events DESC)"))
        .filter(col("rk") === 1)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toMap
      assert(got.keySet == batch.keySet)
      assert(got == batch,
        "final streaming levels must equal the batch q124 rows")
    } finally q.stop()
  }

  test("stale rows are dropped; levels refresh only for touched users") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EwmaEvent]
    val q = EwmaStream.ewmaStream(input.toDS(), k = 2).writeStream
      .format("memory").queryName("ewma_small").outputMode("append").start()
    try {
      input.addData(EwmaEvent(100L, 1L, 1L, 1.0)); q.processAllAvailable()
      // stale (earlier ts) for user 1 + a fresh user 2 event
      input.addData(EwmaEvent(50L, 1L, 2L, 999.0), EwmaEvent(10L, 2L, 3L, 4.0))
      q.processAllAvailable()
      val rows = spark.table("ewma_small").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq.sorted
      // user 1: only its first event ever counted (stale dropped, so no
      // second emission); user 2: one event
      assert(rows == Seq((1L, 1L, 1.0), (2L, 1L, 4.0)))
      // fresh follow-up for user 1: k=2 ring → (8 + 1*0.5)/1.5 = 5.6667
      input.addData(EwmaEvent(200L, 1L, 4L, 8.0)); q.processAllAvailable()
      val last = spark.table("ewma_small").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
        .filter(t => t._1 == 1L && t._2 == 2L)
      assert(last.toSeq == Seq((1L, 2L, 5.6667)))
    } finally q.stop()
  }
}
