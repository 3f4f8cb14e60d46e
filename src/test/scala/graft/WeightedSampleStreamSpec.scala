package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import streaming.WeightedSampleStream
import streaming.WeightedSampleStream.KeyedRow
import operators.WeightedSample

/** 18x — streaming ES weighted sampling: scrambled multi-batch replay
  * converges to exactly the batch q160 election (A-Res ≡ batch by
  * construction), redelivery is idempotent, and the reservoir stays
  * bounded at k. */
class WeightedSampleStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  test("scrambled replay across micro-batches ≡ batch q160 election") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
      .select("source", "doc_id", "n_chars")
    val want = WeightedSample
      .esSample(docs, "source", "doc_id", "n_chars", WeightedSample.K)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    // feed: the same keyed rows, deterministically scrambled (by a
    // hash of the id — NOT arrival-sorted), three micro-batches
    val feed = WeightedSampleStream
      .keyedStream(docs, "source", "doc_id", "n_chars")
      .collect().sortBy(r => r.id * 2654435761L % 1000003)
    val input = MemoryStream[KeyedRow]
    val q = WeightedSampleStream.weightedSample(input.toDS())
      .writeStream.format("memory").queryName("es_sample")
      .outputMode("update").start()
    try {
      feed.grouped(math.max(1, feed.length / 3)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      // redelivery: replay the first chunk again — must change nothing
      input.addData(feed.take(feed.length / 3).toSeq)
      q.processAllAvailable()
      // Update mode re-emits per trigger: keep the LAST emitted rank
      // set per (g, id) and keep only ids whose final emission is
      // current — reconstruct per-domain sets from the final trigger
      // by taking each domain's latest full emission: ranks are dense
      // per emission, so the latest k rows per domain ARE the set
      val got = spark.table("es_sample").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      // last emission per domain = rows from the final batch; easiest
      // reconstruction: for each (g, rk) keep the LAST row emitted
      val byGr = got.zipWithIndex
        .groupBy { case ((g, _, _, rk), _) => (g, rk) }
        .map { case (k, vs) => k -> vs.maxBy(_._2)._1 }
      val finalSet = byGr.values.map { case (g, id, _, rk) => (g, id, rk) }.toSet
      assert(finalSet == want,
        s"stream-final ${finalSet.size} rows != batch ${want.size}")
    } finally q.stop()
  }

  test("reservoir stays bounded at k and ranks are dense") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[KeyedRow]
    val q = WeightedSampleStream.weightedSample(input.toDS(), k = 5)
      .writeStream.format("memory").queryName("es_bounded")
      .outputMode("update").start()
    try {
      // 100 rows, one domain, strictly improving keys (es = id) so the
      // reservoir churns constantly
      (0 until 4).foreach { b =>
        input.addData((1 to 25).map(i =>
          KeyedRow("d", (b * 25 + i).toLong, 1L, (b * 25 + i).toDouble)))
        q.processAllAvailable()
        val last = spark.table("es_bounded").collect()
          .map(r => (r.getLong(1), r.getInt(3)))
        assert(last.map(_._1).distinct.length <= 100)
      }
      val rows = spark.table("es_bounded").collect()
        .map(r => (r.getLong(1), r.getInt(3)))
      // final emission: top-5 ids 100..96 at ranks 1..5
      val finalByRk = rows.zipWithIndex.groupBy(_._1._2)
        .map { case (rk, vs) => rk -> vs.maxBy(_._2)._1._1 }
      assert(finalByRk == Map(1 -> 100L, 2 -> 99L, 3 -> 98L, 4 -> 97L, 5 -> 96L))
    } finally q.stop()
  }
}
