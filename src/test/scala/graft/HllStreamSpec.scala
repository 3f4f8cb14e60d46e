package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.HllStream
import graft.streaming.HllStream.KeyEvent

/** 18v: streaming HLL parity with the batch q245 sketch — including
  * order independence AND duplicate-redelivery harmlessness (max
  * merge is commutative and idempotent; at-least-once delivery gets
  * exactly-once estimates). */
class HllStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def batchRows: Map[String, (Long, Long, Double)] = {
    import spark.implicits._
    operators.Hll.sketch(feedRows.map(e => (e.g, e.k)).toDF("g", "k"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
  }

  private lazy val feedRows: Seq[KeyEvent] =
    Tables.lineitem(spark, "/root/testdata/sf0.001")
      .selectExpr("l_returnflag AS g", "CAST(l_orderkey AS STRING) AS k")
      .collect().map(r => KeyEvent(r.getString(0), r.getString(1))).toSeq

  private def runFeed(feed: Seq[KeyEvent], name: String) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[KeyEvent]
    val q = HllStream.hllStream(input.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      feed.grouped(math.max(1, feed.length / 4)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      // final (lowest-v_zero = most keys absorbed) row per group
      spark.table(name).collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
          r.getDouble(3))))
        .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).minBy(_._1) }
    } finally q.stop()
  }

  test("18v: replay equals the batch q245 sketch exactly") {
    val got = runFeed(feedRows, "hll_rows")
    val batch = batchRows
    assert(got.keySet == batch.keySet)
    got.foreach { case (g, row) =>
      assert(row == batch(g), s"$g: streaming $row vs batch ${batch(g)}")
    }
  }

  test("18v: order-free and duplicate-safe — reversed replay with" +
    " redelivered chunks matches too") {
    val dups = feedRows.reverse ++ feedRows.take(feedRows.length / 3)
    val got = runFeed(dups, "hll_rows_rev")
    val batch = batchRows
    got.foreach { case (g, row) => assert(row == batch(g)) }
  }
}
