package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Context-window preparation operators — the step between a curated
  * corpus and a training run: documents become fixed-size token chunks
  * (retrieval/embedding ingestion) or get packed into fixed-capacity
  * training sequences (LM pre-training). Both are pure window/explode
  * plans over the `documents` table; "token" here is the whitespace
  * token (the house `split(text, ' ')` convention shared by q27/q28/
  * q40), so every boundary is integer-exact on both engines.
  */
object Chunking {

  // ---- q57: fixed-size overlapping token chunks ----

  val ChunkTokens = 32
  val ChunkStride = 24 // 8-token overlap between consecutive chunks

  /** q57: split each document into [[ChunkTokens]]-token chunks every
    * [[ChunkStride]] tokens (trailing chunk keeps the remainder; a
    * document shorter than one chunk yields exactly one). The
    * retrieval-ingestion shape: chunk_text is the materialized slice,
    * (start_tok, end_tok) the 1-based provenance span. Plan: one scan,
    * one `sequence` explode, projection-only math — no shuffle at any
    * scale. nChunks = 1 + ceil(max(n − chunk, 0) / stride), so chunks
    * tile the document and the last window reaches the final token. */
  def chunk(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n_tok", size(col("ws")))
      .withColumn("chunk_id", explode(sequence(lit(0),
        expr(s"CAST((greatest(n_tok - $ChunkTokens, 0) + ${ChunkStride - 1}) div $ChunkStride AS INT)"))))
      .withColumn("start_tok", col("chunk_id") * ChunkStride + 1)
      .withColumn("end_tok", least(col("start_tok") + (ChunkTokens - 1), col("n_tok")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("start_tok").cast("long").as("start_tok"),
        col("end_tok").cast("long").as("end_tok"),
        (col("end_tok") - col("start_tok") + 1).cast("long").as("chunk_tokens"),
        array_join(slice(col("ws"), col("start_tok"),
          col("end_tok") - col("start_tok") + 1), " ").as("chunk_text"))

  def chunk(spark: SparkSession, dir: String): DataFrame =
    chunk(Tables.documents(spark, dir))

  val chunkSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws, len(string_split(text, ' ')) AS n_tok
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, ws, n_tok,
       |    unnest(range(0, 1 + (greatest(n_tok - $ChunkTokens, 0) + ${ChunkStride - 1}) // $ChunkStride)) AS chunk_id
       |  FROM w),
       |s AS (
       |  SELECT doc_id, ws, n_tok, chunk_id,
       |    chunk_id * $ChunkStride + 1 AS start_tok,
       |    least(chunk_id * $ChunkStride + $ChunkTokens, n_tok) AS end_tok
       |  FROM c)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |  CAST(start_tok AS BIGINT) AS start_tok, CAST(end_tok AS BIGINT) AS end_tok,
       |  CAST(end_tok - start_tok + 1 AS BIGINT) AS chunk_tokens,
       |  array_to_string(ws[start_tok:end_tok], ' ') AS chunk_text
       |FROM s""".stripMargin

  // ---- q58: shard-local sequence packing (GPT-style concatenation) ----

  val PackShards = 8
  val PackCapacity = 256

  /** q58: concatenation packing — each shard's documents form one
    * token stream (doc_id order), chopped into [[PackCapacity]]-token
    * training sequences; every document reports its stream span and
    * the sequence range it lands in (provenance: which training
    * sequences contain which document — the q42 contamination trace
    * runs on exactly this mapping).
    *
    * Deliberately SHARD-LOCAL: real packers never run a global prefix
    * sum over a 100 TB corpus — data is sharded and each worker packs
    * its shard independently, sequence ids namespaced by shard. That
    * makes the plan one partitioned window (cumulative sum per shard),
    * embarrassingly parallel, with no partition-less window anywhere.
    * `PackShards` is the parallelism knob; when shards must stay few
    * relative to the corpus, the per-shard offset itself can run
    * banded — [[Pipeline.trainingPipeline]] packs exactly that way via
    * [[BandedCumsum]] (r10), keeping every window task band-bounded. */
  def pack(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), pmod(col("doc_id"), lit(PackShards)).as("shard"),
        size(split(col("text"), " ")).as("n_tok"))
      .withColumn("start_off", coalesce(sum(col("n_tok")).over(w), lit(0)).cast("long"))
      .withColumn("end_off", col("start_off") + col("n_tok"))
      .select(col("doc_id"), col("shard").cast("long").as("shard"),
        col("n_tok").cast("long").as("n_tok"), col("start_off"),
        col("end_off").cast("long").as("end_off"),
        floor(col("start_off") / PackCapacity).as("seq_first"),
        floor((col("end_off") - 1) / PackCapacity).as("seq_last"))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1)
  }

  def pack(spark: SparkSession, dir: String): DataFrame =
    pack(Tables.documents(spark, dir))

  // -------- q276: packing utilization / fragmentation audit --------

  /** q276: the numbers that PRICE a q58 packing before a training run
    * — per shard: token utilization (total tokens over sequences ×
    * capacity: concatenation wastes only each shard's final partial
    * sequence, so utilization → 1 as shards grow; a LOW value means
    * shards are too small for the capacity) and the document
    * BOUNDARY-CROSSING rate (docs spanning ≥ 2 training sequences —
    * the attention-contamination/truncation proxy that decides between
    * concat packing and best-fit bin packing). Both metrics are pure
    * arithmetic over q58's own output — the audit composes the
    * operator it audits (q241 doctrine).
    *
    * Exactness: total tokens, sequence counts and crossing counts are
    * exact integers off q58's provenance columns; the two rates are
    * one shared-text division each. Plan: q58's partitioned window +
    * ONE keyed aggregate. */
  def packUtilization(spark: SparkSession, dir: String): DataFrame =
    pack(spark, dir)
      .groupBy("shard")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_docs"),
        expr("CAST(max(end_off) AS BIGINT)").as("total_tokens"),
        expr("CAST(sum(CASE WHEN n_seqs > 1 THEN 1 ELSE 0 END) AS BIGINT)")
          .as("n_crossing"))
      .selectExpr("shard", "n_docs", "total_tokens", "n_crossing",
        s"CAST(floor((total_tokens - 1) / $PackCapacity) + 1 AS BIGINT) AS n_seqs")
      .selectExpr("shard", "n_docs", "total_tokens", "n_seqs",
        s"round(CAST(total_tokens AS DOUBLE)" +
          s" / nullif(CAST(n_seqs AS DOUBLE) * $PackCapacity.0, 0e0), 6)" +
          " + 0.0 AS utilization",
        "n_crossing",
        "round(CAST(n_crossing AS DOUBLE)" +
          " / nullif(CAST(n_docs AS DOUBLE), 0e0), 6) + 0.0 AS crossing_rate")

  /** DuckDB twin: q58's statement verbatim, one aggregate, the same
    * shared rate texts. */
  lazy val packUtilizationSql: String =
    s"""WITH packed AS (
       |${packSql.linesIterator.map("  " + _).mkString("\n")}
       |),
       |agg AS (
       |  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(max(end_off) AS BIGINT) AS total_tokens,
       |    CAST(sum(CASE WHEN n_seqs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing
       |  FROM packed GROUP BY 1),
       |seqs AS (
       |  SELECT shard, n_docs, total_tokens, n_crossing,
       |    CAST(floor((total_tokens - 1) / $PackCapacity) + 1 AS BIGINT) AS n_seqs
       |  FROM agg)
       |SELECT shard, n_docs, total_tokens, n_seqs,
       |  round(CAST(total_tokens AS DOUBLE)
       |    / nullif(CAST(n_seqs AS DOUBLE) * $PackCapacity.0, 0e0), 6)
       |    + 0.0 AS utilization,
       |  n_crossing,
       |  round(CAST(n_crossing AS DOUBLE)
       |    / nullif(CAST(n_docs AS DOUBLE), 0e0), 6) + 0.0 AS crossing_rate
       |FROM seqs""".stripMargin

  val packSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, doc_id % $PackShards AS shard,
       |    len(string_split(text, ' ')) AS n_tok
       |  FROM documents),
       |o AS (
       |  SELECT doc_id, shard, n_tok,
       |    CAST(coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
       |  FROM t)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard, CAST(n_tok AS BIGINT) AS n_tok,
       |  start_off, CAST(start_off + n_tok AS BIGINT) AS end_off,
       |  CAST(floor(start_off / $PackCapacity) AS BIGINT) AS seq_first,
       |  CAST(floor((start_off + n_tok - 1) / $PackCapacity) AS BIGINT) AS seq_last,
       |  CAST(floor((start_off + n_tok - 1) / $PackCapacity)
       |    - floor(start_off / $PackCapacity) + 1 AS BIGINT) AS n_seqs
       |FROM o""".stripMargin

  // ---- q331: length-bucketed batching waste curve ----

  /** Candidate context capacities for the batching-policy curve. */
  val BatchCapacities: Seq[Int] = Seq(64, 128, 256, 512)
  /** Length-quantile buckets per capacity. */
  val BatchBuckets = 4

  /** q331 — the PADDING-WASTE curve that decides a batching policy
    * (round-16 widening; the question q58's packing answers one way
    * and inference/fine-tuning batchers answer another): per candidate
    * capacity C, every document is clipped to C tokens and padded
    * either (a) straight to C — the naive fixed-shape batch — or
    * (b) to the max of its NTILE([[BatchBuckets]]) length-quantile
    * bucket — length-bucketed batching, the standard padding-waste
    * mitigation. One row per capacity: doc counts, truncation count,
    * both waste totals, and the waste ratio.
    *
    * SCALE SHAPE (the doc-window audit caught the naive form): a
    * row-level ntile window puts the whole corpus into ONE partition
    * per capacity — a single-task sort at 100 TB. The registered plan
    * is the value-level reformulation (the q101/q102 cell trick):
    * rows collapse to (capacity, clipped) cells, cumulative counts
    * over the CELL grid (window partitions bounded by value
    * cardinality ≤ capacity, never by rows) locate each ntile
    * bucket's rank range R_{k−1}..R_k (sizes n/B +1 for the first
    * n mod B — ntile's exact rule), per-(cell, bucket) overlap counts
    * reproduce tie-splitting bit-for-bit, and bucket_max(k) = the max
    * value with nonzero overlap. The DuckDB twin keeps the ROW-LEVEL
    * ntile form — the hash gate is therefore a proof that the
    * cell-level plan ≡ the textbook formulation. */
  def batchingWaste(docs: DataFrame): DataFrame = {
    val perDoc = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val cells = perDoc
      .select(col("n_tok"), explode(typedLit(BatchCapacities)).as("capacity"))
      .withColumn("clipped", least(col("n_tok"), col("capacity").cast("long")))
      .groupBy(col("capacity"), col("clipped"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("n_tok") > col("capacity"), 1L).otherwise(0L)).as("n_trunc"))
    val byVal = Window.partitionBy(col("capacity")).orderBy(col("clipped"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("capacity"))
    val ranked = cells
      .withColumn("c_hi", sum(col("n")).over(byVal))
      .withColumn("c_lo", col("c_hi") - col("n"))
      .withColumn("n_tot", sum(col("n")).over(tot))
    // bucket k's last rank: R_k = k·floor(n/B) + min(k, n mod B).
    // floor(n/B) must be INTEGER division — Spark's `/` on longs is
    // double division, which only coincides with ntile's rule when
    // n_tot is a multiple of B (the r16 advice finding).
    val b = lit(BatchBuckets.toLong)
    val base = floor(col("n_tot") / b).cast("long")
    val overlaps = ranked
      .select(col("*"), explode(typedLit((1 to BatchBuckets).map(_.toLong))).as("k"))
      .withColumn("r_hi", col("k") * base +
        least(col("k"), col("n_tot") % b))
      .withColumn("r_lo", (col("k") - 1) * base +
        least(col("k") - 1, col("n_tot") % b))
      .withColumn("n_vk", greatest(lit(0L),
        least(col("c_hi"), col("r_hi")) - greatest(col("c_lo"), col("r_lo"))))
      .filter(col("n_vk") > 0)
    val bw = Window.partitionBy(col("capacity"), col("k"))
    // bucket-independent stats straight from the cells (a cell can
    // split across buckets — counting truncation through the split
    // would integer-divide it away)
    val flat = cells.groupBy(col("capacity"))
      .agg(expr("CAST(sum(n) AS BIGINT)").as("n_docs"),
        expr("CAST(sum(n_trunc) AS BIGINT)").as("n_truncated"),
        expr("CAST(sum(n * (capacity - clipped)) AS BIGINT)")
          .as("waste_pad_to_cap"))
    val bucketed = overlaps
      .withColumn("bucket_max", max(col("clipped")).over(bw))
      .groupBy(col("capacity"))
      .agg(expr("CAST(sum(n_vk * (bucket_max - clipped)) AS BIGINT)")
        .as("waste_bucketed"))
    flat.join(bucketed, Seq("capacity"))
      .selectExpr("capacity", "n_docs", "n_truncated", "waste_pad_to_cap",
        "waste_bucketed",
        "round(CAST(waste_bucketed AS DOUBLE)" +
          " / nullif(CAST(waste_pad_to_cap AS DOUBLE), 0e0), 6) + 0.0" +
          " AS waste_ratio")
  }

  def batchingWaste(spark: SparkSession, dir: String): DataFrame =
    batchingWaste(Tables.documents(spark, dir))

  /** DuckDB twin of [[batchingWaste]]: same explode, same ntile total
    * order, same integer waste sums. */
  val batchingWasteSql: String = {
    val caps = BatchCapacities.mkString(", ")
    s"""WITH perdoc AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |bycap AS (
       |  SELECT doc_id, n_tok, CAST(capacity AS INT) AS capacity,
       |    least(n_tok, capacity) AS clipped
       |  FROM perdoc CROSS JOIN (SELECT unnest([$caps]) AS capacity)),
       |bucketed AS (
       |  SELECT *,
       |    ntile($BatchBuckets) OVER (PARTITION BY capacity
       |      ORDER BY clipped, doc_id) AS bucket
       |  FROM bycap),
       |withmax AS (
       |  SELECT *,
       |    max(clipped) OVER (PARTITION BY capacity, bucket) AS bucket_max
       |  FROM bucketed)
       |SELECT capacity, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN n_tok > capacity THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_truncated,
       |  CAST(sum(capacity - clipped) AS BIGINT) AS waste_pad_to_cap,
       |  CAST(sum(bucket_max - clipped) AS BIGINT) AS waste_bucketed,
       |  round(CAST(sum(bucket_max - clipped) AS DOUBLE)
       |    / nullif(CAST(sum(capacity - clipped) AS DOUBLE), 0e0), 6) + 0.0
       |    AS waste_ratio
       |FROM withmax GROUP BY capacity""".stripMargin
  }
}
