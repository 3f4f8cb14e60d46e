package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.KmvStream
import graft.streaming.KmvStream.KeyEvent

/** 18ee: streaming KMV parity with the batch q264 sketch — kept SET,
  * kth minimum and estimate all equal the batch aggregate exactly;
  * order independence and duplicate-redelivery idempotence live. */
class KmvStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private lazy val feedRows: Seq[KeyEvent] =
    Tables.lineitem(spark, "/root/testdata/sf0.001")
      .selectExpr("l_returnflag AS g", "CAST(l_orderkey AS STRING) AS k")
      .collect().map(r => KeyEvent(r.getString(0), r.getString(1))).toSeq

  private def batchRows: Map[String, (Long, Seq[Long])] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val hashed = feedRows.map(e => (e.g, e.k)).toDF("g", "k")
      .select(col("g"), functions.Hashing.hash48(col("k")).as("h"))
    operators.Kmv.bottomK(hashed).selectExpr("g", "sz", "hs")
      .as[(String, Long, Seq[Long])].collect()
      .map { case (g, sz, hs) => g -> ((sz, hs)) }.toMap
  }

  private def runFeed(feed: Seq[KeyEvent], name: String) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[KeyEvent]
    val q = KmvStream.kmvStream(input.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      feed.grouped(math.max(1, feed.length / 4)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      // final (largest-sz, then smallest-hk) emission per group
      spark.table(name).collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getSeq[Long](4))))
        .groupBy(_._1)
        .map { case (g, rs) =>
          g -> rs.map(_._2).maxBy(t => (t._1, -t._2))
        }
    } finally q.stop()
  }

  test("18ee: replay equals the batch q264 sketch set exactly") {
    val got = runFeed(feedRows, "kmv_rows")
    val batch = batchRows
    assert(got.keySet == batch.keySet)
    got.foreach { case (g, (sz, hk, est, hs)) =>
      val (bsz, bhs) = batch(g)
      assert(sz == bsz && hs == bhs, s"$g kept set diverged")
      if (sz < operators.Kmv.K) assert(est == sz.toDouble)
      else {
        assert(hk == bhs.last)
        assert(est == 7.177611906121728e16 / (hk.toDouble + 1.0))
      }
    }
  }

  test("18ee: order-free and duplicate-idempotent — reversed replay" +
    " with redelivered chunks matches too") {
    val dups = feedRows.reverse ++ feedRows.take(feedRows.length / 3)
    val got = runFeed(dups, "kmv_rows_rev")
    val batch = batchRows
    got.foreach { case (g, (sz, _, _, hs)) =>
      assert((sz, hs) == batch(g))
    }
  }
}
