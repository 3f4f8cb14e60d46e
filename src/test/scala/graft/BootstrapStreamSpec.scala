package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.BootstrapStream
import graft.streaming.BootstrapStream.CiEvent

/** 18s: streaming bootstrap-CI parity with the batch q144 operator —
  * including ORDER independence (sums commute; no delivery-order
  * contract, unlike the sequential twins). */
class BootstrapStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def batchRows = {
    val dir = "/root/testdata/sf0.001"
    operators.Bootstrap.segmentBalanceCi(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
  }

  private def feedRows = Tables.customer(spark, "/root/testdata/sf0.001")
    .filter(col("c_mktsegment").isNotNull && col("c_acctbal").isNotNull)
    .selectExpr("c_mktsegment", "c_custkey",
      "CAST(floor(c_acctbal * 1e2) AS BIGINT) AS bal_c")
    .collect()
    .map(r => CiEvent(r.getString(0), r.getLong(1), r.getLong(2)))

  private def runFeed(feed: Seq[CiEvent], name: String) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[CiEvent]
    val q = BootstrapStream.bootstrapCiStream(input.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      feed.grouped(math.max(1, feed.length / 3)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      spark.table(name).collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))))
        .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).maxBy(_._1) }
    } finally q.stop()
  }

  test("18s: replay equals batch q144 exactly") {
    val got = runFeed(feedRows.toSeq, "ci_rows")
    val batch = batchRows
    assert(got.keySet == batch.keySet)
    got.foreach { case (g, row) =>
      assert(row == batch(g), s"$g: streaming $row vs batch ${batch(g)}")
    }
  }

  test("18s: order-independent — a reversed shuffled replay matches too") {
    val got = runFeed(feedRows.reverse.toSeq, "ci_rows_rev")
    val batch = batchRows
    got.foreach { case (g, row) => assert(row == batch(g)) }
  }
}
