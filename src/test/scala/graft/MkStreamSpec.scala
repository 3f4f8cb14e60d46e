package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DriftStream
import graft.streaming.DriftStream.TrendEvent

/** 18r: streaming Mann–Kendall parity with the batch q143 operator. */
class MkStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  test("18r mkTrendStream: ordered replay converges to batch q143 exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batch = operators.MannKendall.orderRevenueTrend(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5))))
      .toMap
    // the SAME day cells the batch operator aggregates, replayed in
    // per-series day order across three micro-batches
    val feed = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull
        && col("o_orderpriority").isNotNull)
      .groupBy(col("o_orderpriority").as("g"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')" +
          " AS BIGINT)").as("day"))
      .agg(expr("CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT))" +
        " AS BIGINT)").as("xc"))
      .collect()
      .map(r => TrendEvent(r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_.day)
    val input = MemoryStream[TrendEvent]
    val q = DriftStream.mkTrendStream(input.toDS()).writeStream
      .format("memory").queryName("mk_rows").outputMode("update").start()
    try {
      feed.grouped(math.max(1, feed.length / 3)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      // update mode: take each series' final emission (max buckets seen)
      val got = spark.table("mk_rows").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getString(5))))
        .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).maxBy(_._1) }
      assert(got.keySet == batch.keySet)
      got.foreach { case (g, row) =>
        assert(row == batch(g), s"$g: streaming $row vs batch ${batch(g)}")
      }
    } finally q.stop()
  }

  test("late or duplicate day buckets are dropped, state unharmed") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[TrendEvent]
    val q = DriftStream.mkTrendStream(input.toDS()).writeStream
      .format("memory").queryName("mk_late").outputMode("update").start()
    try {
      input.addData(Seq(TrendEvent("s", 1L, 10L), TrendEvent("s", 2L, 20L)))
      q.processAllAvailable()
      // a duplicate of day 2 and a late day 1 must both be ignored
      input.addData(Seq(TrendEvent("s", 2L, 999L), TrendEvent("s", 1L, 999L),
        TrendEvent("s", 3L, 30L)))
      q.processAllAvailable()
      val last = spark.table("mk_late").collect()
        .map(r => (r.getLong(1), r.getLong(2))).maxBy(_._1)
      // three buckets, strictly increasing → S = C(3,2) = 3
      assert(last == ((3L, 3L)))
    } finally q.stop()
  }
}
