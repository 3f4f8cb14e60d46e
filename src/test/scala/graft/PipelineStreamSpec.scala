package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import streaming.{EventStream, PipelineStream, WeightedSampleStream}
import streaming.WeightedSampleStream.KeyedRow
import operators.{Chunking, Pipeline}

/** Composed streaming flagship (r13 verdict #7): the q162 pipeline's
  * stateful stages — per-lang exact-quota ES election, then per-shard
  * sequence packing across the epoch barrier — driven as real streams
  * with scrambled micro-batches AND duplicate redelivery, must
  * reproduce the batch q162 output exactly: same winners, same
  * offsets, same training-sequence spans. */
class PipelineStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  private val dir = "/root/testdata/sf0.001"

  test("scrambled+duplicated replay through election→barrier→pack ≡ batch q162") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // the batch truth: full q162 output keyed by doc_id
    val want = Pipeline.trainingPipelineEs(docs).collect().map { r =>
      r.getLong(r.fieldIndex("doc_id")) ->
        (r.getLong(r.fieldIndex("shard")), r.getLong(r.fieldIndex("n_tok")),
          r.getLong(r.fieldIndex("start_off")), r.getLong(r.fieldIndex("end_off")),
          r.getLong(r.fieldIndex("seq_first")), r.getLong(r.fieldIndex("seq_last")))
    }.toMap
    assert(want.nonEmpty)

    // ---- stage 3 as a stream: scrambled 4-batch replay + redelivery
    val kept = Pipeline.keptFrame(docs)
    val feed = WeightedSampleStream
      .keyedStream(kept, "lang", "doc_id", "n_tok")
      .collect().sortBy(r => r.id * 2654435761L % 1000003)
    val input = MemoryStream[KeyedRow]
    val q = PipelineStream.electionStream(input.toDS())
      .writeStream.format("memory").queryName("pipe_elect")
      .outputMode("update").start()
    val elected: Map[Long, String] =
      try {
        feed.grouped(math.max(1, feed.length / 4)).foreach { b =>
          input.addData(b.toSeq); q.processAllAvailable()
        }
        // duplicate redelivery of an early chunk: must change nothing
        input.addData(feed.take(feed.length / 4).toSeq)
        q.processAllAvailable()
        // Update-mode reconstruction: last emission per (g, rk) wins
        val got = spark.table("pipe_elect").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
        got.zipWithIndex
          .groupBy { case ((g, _, rk), _) => (g, rk) }
          .map { case (_, vs) => vs.maxBy(_._2)._1 }
          .map { case (g, id, _) => id -> g }.toMap
      } finally q.stop()
    assert(elected.keySet == want.keySet,
      s"stream election ${elected.size} docs != batch ${want.size}")

    // ---- epoch barrier, then stage 4 as a stream: per-shard doc_id
    // arrival order (packStream's replay contract), split across three
    // micro-batches by doc_id range so every shard's state survives
    // multiple triggers
    val keptTok = kept.select(col("doc_id"), col("n_tok")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val packFeed = elected.keys.toSeq.sorted.map { id =>
      EventStream.PackDoc(id, math.floorMod(id, Chunking.PackShards.toLong),
        keptTok(id))
    }
    val pin = MemoryStream[EventStream.PackDoc]
    val pq = PipelineStream.packElected(pin.toDS())
      .writeStream.format("memory").queryName("pipe_pack")
      .outputMode("append").start()
    val packed =
      try {
        packFeed.grouped(math.max(1, packFeed.length / 3)).foreach { b =>
          pin.addData(b.toSeq); pq.processAllAvailable()
        }
        spark.table("pipe_pack").collect().map { r =>
          r.getLong(r.fieldIndex("doc_id")) ->
            (r.getLong(r.fieldIndex("shard")), r.getLong(r.fieldIndex("n_tok")),
              r.getLong(r.fieldIndex("start_off")), r.getLong(r.fieldIndex("end_off")),
              r.getLong(r.fieldIndex("seq_first")), r.getLong(r.fieldIndex("seq_last")))
        }.toMap
      } finally pq.stop()
    assert(packed == want, {
      val bad = want.keys.find(k => packed.get(k) != want.get(k))
      s"first divergence at doc_id $bad: stream ${bad.flatMap(packed.get)}" +
        s" vs batch ${bad.flatMap(want.get)}"
    })
  }

  test("the election stream's reservoirs stay bounded at kmax per lang") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val kmax = Pipeline.EsQuotas.map(_._2).max.toInt
    val input = MemoryStream[KeyedRow]
    val q = PipelineStream.electionStream(input.toDS())
      .writeStream.format("memory").queryName("pipe_bound")
      .outputMode("update").start()
    try {
      input.addData((1 to 3 * kmax).map(i =>
        KeyedRow("en", i.toLong, 1L, i.toDouble)))
      q.processAllAvailable()
      val lastEmit = spark.table("pipe_bound").collect()
        .map(r => (r.getLong(1), r.getInt(3)))
      // quota for en bounds the emitted prefix; ranks dense from 1
      val quota = Pipeline.EsQuotas.toMap.apply("en")
      assert(lastEmit.map(_._2).max <= quota)
      assert(lastEmit.map(_._2).distinct.sorted.take(3).toSeq == Seq(1, 2, 3))
    } finally q.stop()
  }
}
