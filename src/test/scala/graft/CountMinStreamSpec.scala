package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CountMinStream
import graft.streaming.CountMinStream.TermEvent

/** 18cc: streaming CMS parity with the batch q246 table — compaction
  * (max per partition cell) + cross-partition sum reproduces the
  * batch table exactly, the batch probe runs unchanged on it, and
  * replay order doesn't matter (sums commute). */
class CountMinStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  // a skewed little vocabulary: term-i occurs i times
  private val feed: Seq[TermEvent] = (1 to 30).flatMap { i =>
    Seq.fill(i)(TermEvent(math.abs(s"t$i".hashCode) % 8, s"t$i"))
  }

  private def batchTable: Map[(Int, Int), Long] = {
    import spark.implicits._
    val cells = feed.groupBy(_.t).toSeq
      .map { case (t, es) => (t, es.size.toLong) }.toDF("t", "c")
    operators.CountMin.table(cells).collect()
      .map(r => (r.getInt(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
  }

  private def runFeed(evts: Seq[TermEvent], name: String):
      Map[(Int, Int), Long] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[TermEvent]
    val q = CountMinStream.cmsStream(input.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      evts.grouped(math.max(1, evts.length / 4)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      spark.table(name).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3))
        .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).max } // compact
        .toSeq
        .groupBy { case ((_, di, b), _) => (di, b) } // sum across partitions
        .map { case (k, rs) => k -> rs.map(_._2).sum }
    } finally q.stop()
  }

  test("18cc: replayed changelog compacts to the batch q246 table" +
    " and the batch probe reads it identically") {
    val got = runFeed(feed, "cms_rows")
    val want = batchTable
    assert(got == want)
    // batch probe over the streamed table: estimates must match the
    // batch-table estimates for every term
    import spark.implicits._
    val streamedTbl = got.toSeq.map { case ((di, b), tot) =>
      (di, b.toLong, tot) }.toDF("di", "b", "tot")
    val terms = feed.map(_.t).distinct.toDF("t")
    val fromStream = operators.CountMin.estimates(terms, streamedTbl)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    feed.groupBy(_.t).foreach { case (t, es) =>
      assert(fromStream(t) >= es.size.toLong, t) // CMS invariant holds
    }
  }

  test("18cc: order-free — a reversed replay compacts to the same table") {
    assert(runFeed(feed.reverse, "cms_rows_rev") == batchTable)
  }
}
