package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import streaming.TrendStream
import streaming.TrendStream.TrendEvent

/** Streaming twin of q168 (18x): the compacted level-cell changelog
  * fed to TrendTest.fromCells reproduces the batch trend z exactly,
  * under batched, scrambled, and duplicate-delivery replays. */
class TrendStreamSpec extends AnyFunSuite {
  lazy val spark = Engine.session()

  private def batchRow = {
    operators.TrendTest.priorityFinishTrend(spark, "/root/testdata/sf0.001")
      .collect().head
  }

  private def feed() =
    Tables.orders(spark, "/root/testdata/sf0.001")
      .filter(col("o_orderpriority").isNotNull && col("o_orderstatus").isNotNull)
      .selectExpr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w",
        "o_orderkey AS seq", "o_orderstatus = 'F' AS s")
      .collect()
      .map(r => TrendEvent(r.getLong(0), r.getLong(1), r.getBoolean(2)))

  private def runAndCompare(batches: Seq[Seq[TrendEvent]], name: String): Unit = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[TrendEvent]
    val q = TrendStream.cellStream(input.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val compacted = spark.table(name)
        .withColumn("rk", expr(
          "row_number() OVER (PARTITION BY w ORDER BY n_c DESC)"))
        .filter(col("rk") === 1)
        .select(col("w"), col("n_c"), col("x_c"))
      val live = operators.TrendTest.fromCells(compacted).collect().head
      assert(live.toSeq == batchRow.toSeq,
        "live z from the compacted changelog must equal the batch q168 row")
    } finally q.stop()
  }

  test("ordered replay in 3 batches equals batch q168") {
    val f = feed().sortBy(_.seq)
    runAndCompare(f.grouped(math.max(1, f.length / 3)).map(_.toSeq).toSeq,
      "trend_log_ordered")
  }

  test("scrambled-within-batch replay with duplicate deliveries equals batch q168") {
    // within-batch order is scrambled (the handler re-sorts by seq);
    // across batches each level's seqs stay monotone (the EwmaStream
    // delivery contract); the middle batch is then replayed verbatim —
    // its now-stale rows must be dropped, not double-counted
    val f = feed().sortBy(_.seq)
    val rnd = new scala.util.Random(168)
    val parts = f.grouped(math.max(1, f.length / 4))
      .map(b => rnd.shuffle(b.toSeq)).toSeq
    runAndCompare(parts :+ parts(parts.length / 2), "trend_log_scrambled")
  }

  test("hand case: snapshots refresh per touched level only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[TrendEvent]
    val q = TrendStream.cellStream(input.toDS()).writeStream
      .format("memory").queryName("trend_small").outputMode("append").start()
    try {
      input.addData(TrendEvent(1L, 1L, true), TrendEvent(2L, 2L, false))
      q.processAllAvailable()
      input.addData(TrendEvent(1L, 3L, false)) // level 2 untouched
      q.processAllAvailable()
      val rows = spark.table("trend_small").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      assert(rows == Seq((1L, 1L, 1L), (1L, 2L, 1L), (2L, 1L, 0L)))
    } finally q.stop()
  }
}
