package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Chunking, Pipeline}

/** Streaming FLAGSHIP — the q162 training pipeline's stateful stages
  * composed end-to-end on a stream (r13 verdict #7): the per-lang
  * exact-quota Efraimidis–Spirakis election runs CONTINUOUSLY
  * ([[WeightedSampleStream]] — bounded kmax-entry reservoirs, Update
  * mode), and the per-shard sequence packing ([[EventStream.packStream]]
  * — one running offset per shard) assigns training-sequence spans in
  * Append mode.
  *
  * Composition contract — the EPOCH BARRIER: a reservoir election is
  * revisable while data still arrives (a later heavier doc can evict
  * an earlier winner), but a pack offset is permanent the moment it is
  * emitted. Chaining them as one unbroken stream would pack docs the
  * election later revokes; the honest composition is staged — the
  * election stream runs to the end of the ingest epoch, and its FINAL
  * elected set feeds the pack stream (per-shard doc_id arrival order,
  * [[EventStream.packStream]]'s replay contract). With that barrier,
  * scrambled multi-batch replay with duplicate redelivery reproduces
  * the batch q162 output EXACTLY (PipelineStreamSpec) — same winners
  * (A-Res ≡ batch ES by construction, id-dedup makes redelivery
  * idempotent), same offsets, same sequence spans.
  *
  * Stages 1–2 (curation) are aggregate/window-shaped (one corpus scan,
  * Gopher grams, canonical window) and remain a batch/epoch step —
  * they produce the kept frame this stream ingests. */
object PipelineStream {

  /** The q162 quota prefix as a column over the elected `g` — same
    * static literals as [[Pipeline.EsQuotas]] (no join, no
    * data-dependent k). */
  private def quotaOf = Pipeline.EsQuotas.foldLeft(lit(0L)) {
    case (acc, (l, q)) => when(col("g") === l, lit(q)).otherwise(acc)
  }

  /** The stateless keying front end over the curated kept frame
    * (columns lang, doc_id, n_tok) — pure row expressions, runs
    * unchanged on the streaming frame. */
  def keyedKept(kept: DataFrame): Dataset[WeightedSampleStream.KeyedRow] =
    WeightedSampleStream.keyedStream(kept, "lang", "doc_id", "n_tok")

  /** Stage 3, continuous: per-lang bounded reservoir election over the
    * keyed stream, each trigger emitting the CURRENT quota-prefix
    * winner set per lang. */
  def electionStream(keyed: Dataset[WeightedSampleStream.KeyedRow])
      : Dataset[WeightedSampleStream.Elected] = {
    import keyed.sparkSession.implicits._
    val kmax = Pipeline.EsQuotas.map(_._2).max.toInt
    WeightedSampleStream.weightedSample(keyed, kmax)
      .filter(col("rk") <= quotaOf)
      .as[WeightedSampleStream.Elected]
  }

  /** Stage 4, post-barrier: pack the epoch-final elected docs (shard =
    * doc_id mod PackShards, the batch rule) into training-sequence
    * spans — one bounded offset per shard, Append mode. */
  def packElected(elected: Dataset[EventStream.PackDoc])
      : Dataset[EventStream.PackedDoc] =
    EventStream.packStream(elected)

  /** q259 — the composed streaming pipeline EXECUTED and registered
    * under the driver's FULL-HASH gate (r14 verdict #5: the 30
    * streaming twins were spec-only; this puts one real Structured
    * Streaming run under CORRECTNESS). The replay is the
    * PipelineStreamSpec recipe productized: scramble the kept frame
    * deterministically (id·2654435761 mod 1000003 — a fixed Knuth
    * multiplicative shuffle), feed the ELECTION stream in two
    * micro-batches plus a duplicate redelivery of the first half
    * (must change nothing), reconstruct the epoch-final winner set
    * from the Update-mode sink (last emission per (g, rk) wins), then
    * run the PACK stream post-barrier in per-shard doc_id arrival
    * order across two micro-batches. (The SPEC replays the heavier
    * 4+dup+3 recipe; the registered row uses the lighter one because
    * each micro-batch carries a fixed ~0.5 s latency floor that is
    * harness, not data — adjudicated in BASELINE.md r15.) The result equals batch q162
    * EXACTLY, so the oracle is q162's own SQL — a streaming execution
    * hash-checked against DuckDB.
    *
    * Scale note (why the collect()s are honest): this function is the
    * REPLAY HARNESS — the epoch barrier and the micro-batch feeder are
    * driver actions by construction (a test-scale reenactment of "two
    * long-lived jobs with a checkpoint barrier between them"). The
    * OPERATORS under test — bounded kmax reservoirs, one offset per
    * shard — hold state independent of corpus size; they are the
    * 100 TB path, and they are what the hash gate pins. */
  def replayEpoch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // state-store tasks = shuffle partitions AT QUERY START; the replay
    // runs 7 micro-batches over 2 stateful queries whose state is a few
    // HUNDRED rows, so 32 state partitions is pure per-batch overhead
    // (measured 13.8 s → ~5 s at sf0.1 with 4). Restored in finally —
    // this knob scopes to the harness, not the session.
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try replayEpochImpl(spark, dir)
    finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  private def replayEpochImpl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val kept = Pipeline.keptFrame(Tables.documents(spark, dir))
    val feed = Replay.knuthSorted(keyedKept(kept).collect())(
      r => r.id * 2654435761L % 1000003)
    val tag = java.util.UUID.randomUUID().toString.takeWhile(_ != '-')
    val electName = s"q259_elect_$tag"
    val input = MemoryStream[WeightedSampleStream.KeyedRow]
    val eq = electionStream(input.toDS())
      .writeStream.format("memory").queryName(electName)
      .outputMode("update").start()
    val elected: Set[Long] =
      try {
        feed.grouped(math.max(1, feed.length / 2)).foreach { b =>
          input.addData(b); eq.processAllAvailable()
        }
        input.addData(feed.take(feed.length / 2)) // duplicate redelivery
        eq.processAllAvailable()
        spark.table(electName).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
          .zipWithIndex
          .groupBy { case ((g, _, rk), _) => (g, rk) }
          .map { case (_, vs) => vs.maxBy(_._2)._1._2 }.toSet
      } finally { eq.stop(); spark.catalog.dropTempView(electName) }
    val keptTok = kept.select(col("doc_id"), col("n_tok")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val packFeed = elected.toSeq.sorted.map { id =>
      EventStream.PackDoc(id,
        math.floorMod(id, Chunking.PackShards.toLong), keptTok(id))
    }
    val packName = s"q259_pack_$tag"
    val pin = MemoryStream[EventStream.PackDoc]
    val pq = packElected(pin.toDS())
      .writeStream.format("memory").queryName(packName)
      .outputMode("append").start()
    val packed: Seq[EventStream.PackedDoc] =
      try {
        packFeed.grouped(math.max(1, packFeed.length / 2)).foreach { b =>
          pin.addData(b); pq.processAllAvailable()
        }
        // materialize BEFORE dropping the sink view — the returned
        // frame must stay valid for the caller's write
        spark.table(packName).as[EventStream.PackedDoc].collect().toSeq
      } finally { pq.stop(); spark.catalog.dropTempView(packName) }
    packed.toDS().toDF()
      .select(col("doc_id"), col("shard"), col("n_tok"), col("start_off"),
        col("end_off"), col("seq_first"), col("seq_last"), col("n_seqs"))
  }

  /** DuckDB twin of [[replayEpoch]]: q162's own oracle projected to the
    * pack-stream columns — replay ≡ batch is the contract under test. */
  val replayEpochSql: String =
    s"""SELECT doc_id, shard, n_tok, start_off, end_off, seq_first,
       |  seq_last, CAST(seq_last - seq_first + 1 AS BIGINT) AS n_seqs
       |FROM (${Pipeline.trainingPipelineEsSql.replace("\n", " ")}) t""".stripMargin
}
