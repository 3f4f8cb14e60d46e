package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import streaming.TimeDecayStream

/** Time-decay attribution stream (18gg): ordered replay across
  * micro-batch boundaries reproduces the registered q294 rollup
  * bit-for-bit, including organic and the state carry. */
class TimeDecayStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  test("ordered replay reproduces the batch q294 rollup exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batch = operators.TimeDecay.eventTimeDecay(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    val feed = Tables.events(spark, dir)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"), col("event_type"), col("value"))
      .as[TimeDecayStream.TdEvent].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[TimeDecayStream.TdEvent]
    val q = TimeDecayStream.timeDecayStream(input.toDS()).writeStream
      .format("memory").queryName("td").outputMode("append").start()
    try {
      // three micro-batches: the touch window must carry across
      val (b1, rest) = feed.splitAt(feed.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      input.addData(b3.toSeq); q.processAllAvailable()
      val got = spark.table("td")
        .groupBy("touch_type")
        .agg(expr("CAST(sum(n_pairs) AS BIGINT)").as("n_pairs"),
          expr("round(CAST(sum(share_n) AS DOUBLE) / 1e9, 4) + 0.0")
            .as("conversions"),
          expr("round(CAST(sum(rev_n) AS DOUBLE) / 1e4, 4) + 0.0")
            .as("revenue"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("a purchase in a later batch credits a touch from an earlier batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.sql.Timestamp
    def ev(u: Long, h: Long, id: Long, t: String, v: Double) =
      TimeDecayStream.TdEvent(u, new Timestamp(h * 3600000L), id, t,
        if (v == 0.0) None else Some(v))
    val input = MemoryStream[TimeDecayStream.TdEvent]
    val q = TimeDecayStream.timeDecayStream(input.toDS()).writeStream
      .format("memory").queryName("td2").outputMode("append").start()
    try {
      input.addData(ev(1L, 0L, 1L, "click", 0.0)); q.processAllAvailable()
      input.addData(ev(1L, 2L, 2L, "purchase", 50.0)); q.processAllAvailable()
      val rows = spark.table("td2").collect()
      assert(rows.length == 1)
      assert(rows.head.getString(2) == "click")
      assert(rows.head.getLong(4) == 1000000000L) // sole touch: full share
    } finally q.stop()
  }
}
