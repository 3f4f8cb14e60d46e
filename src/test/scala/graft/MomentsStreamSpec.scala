package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import streaming.MomentsStream
import streaming.MomentsStream.MomentEvent

/** Streaming twin of q180 (18z): fixed-pivot power sums re-centered to
  * the canonical batch pivot reproduce the batch Jarque–Bera rows
  * BIT-FOR-BIT, under ordered, scrambled, and duplicate-delivery
  * replays; the re-centering shift is checked on a hand case whose
  * stream pivot is far from the batch pivot. */
class MomentsStreamSpec extends AnyFunSuite {
  lazy val spark = Engine.session()

  private val Pivot = 150L // thousand-dollar grid pivot

  /** Orders on the thousand-dollar grid (keeps Σd⁴ comfortably inside
    * the stream's Long state — the documented grid contract). */
  private def gridFrame = {
    Tables.orders(spark, "/root/testdata/sf0.001")
      .join(broadcast(Tables.customer(spark, "/root/testdata/sf0.001")
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_mktsegment AS g", "o_orderkey AS seq",
        "CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS x")
  }

  private def batchRows = {
    operators.JarqueBera.jarqueBera(gridFrame.select("g", "x"))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
  }

  private def feed() = gridFrame.collect()
    .map(r => MomentEvent(r.getString(0), r.getLong(1), r.getLong(2)))

  private def runAndCompare(batches: Seq[Seq[MomentEvent]],
      name: String): Unit = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[MomentEvent]
    val q = MomentsStream.momentStream(input.toDS(), Pivot).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val compacted = spark.table(name)
        .withColumn("rk", expr(
          "row_number() OVER (PARTITION BY g ORDER BY n DESC)"))
        .filter(col("rk") === 1)
        .select("g", "n", "t1", "t2", "t3", "t4")
      val live = MomentsStream.jbFromSnapshots(compacted, Pivot)
        .collect().map(r => r.getString(0) -> r.toSeq).toMap
      val batch = batchRows
      assert(live.keySet == batch.keySet)
      live.foreach { case (g, row) =>
        assert(row == batch(g), s"segment $g: live JB must equal batch")
      }
    } finally q.stop()
  }

  test("ordered replay in 3 batches equals batch q180 bit-for-bit") {
    val f = feed().sortBy(_.seq)
    runAndCompare(f.grouped(math.max(1, f.length / 3)).map(_.toSeq).toSeq,
      "moments_log_ordered")
  }

  test("scrambled replay with a duplicated batch equals batch q180") {
    val f = feed().sortBy(_.seq)
    val rnd = new scala.util.Random(180)
    val parts = f.grouped(math.max(1, f.length / 4))
      .map(b => rnd.shuffle(b.toSeq)).toSeq
    runAndCompare(parts :+ parts(parts.length / 2), "moments_log_scrambled")
  }

  test("re-centering: a far-off stream pivot lands on the batch chain") {
    import spark.implicits._
    // batch pivot of {0,10,10,20} is 10; stream runs at pivot 999
    val rows = Seq(("A", 1L, 0L), ("A", 2L, 10L), ("A", 3L, 10L),
      ("A", 4L, 20L))
    val snapshots = rows.map { case (_, _, x) =>
      val d = x - 999L
      (d, d * d, d * d * d, d * d * d * d)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
    val snapDf = Seq(("A", 4L, snapshots._1, snapshots._2, snapshots._3,
      snapshots._4)).toDF("g", "n", "t1", "t2", "t3", "t4")
    val live = MomentsStream.jbFromSnapshots(snapDf, 999L).collect().head
    val batch = operators.JarqueBera.jarqueBera(
      rows.map(r => (r._1, r._3)).toDF("g", "x")).collect().head
    assert(live.toSeq == batch.toSeq)
    assert(live.getDouble(live.fieldIndex("jb")) == 0.1667)
  }
}
