package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorMath

/** OPQ-family rotated product quantization (Ge et al. CVPR 2013
  * "Optimized Product Quantization"; the structured-rotation variant
  * every production PQ stack ships — Faiss/ScaNN precondition PQ with
  * a random orthonormal rotation for exactly this reason): PQ splits
  * dimensions into M fixed blocks, so its quantization error depends
  * on how variance and correlation happen to fall ACROSS those blocks;
  * rotating the space first equidistributes energy over coordinates,
  * making the fixed blocks near-optimal without learning a per-corpus
  * R. Cosine is rotation-invariant, so the q69 ADC program runs in the
  * rotated coordinates UNCHANGED — same codebook fit, same lookup
  * scoring, same shortlist + exact re-rank — and returns the same
  * semantics (top-k by cosine) with a different (usually lower)
  * quantization error behind the shortlist.
  *
  * WHY NOT the learned SVD rotation: non-parametric OPQ alternates a
  * Procrustes solve (SVD of a d×d scatter) with the PQ fit; an SVD is
  * not re-derivable as an exactness-grade SQL oracle, so the learned R
  * would demote the whole query from the hash gate to a rows-only
  * check. The structured rotation keeps the gate: R = H·D/√d with H
  * the order-64 Walsh–Hadamard matrix (H_ij = (−1)^popcount(i AND j))
  * and D a deterministic ±1 diagonal (md5-parity signs, the
  * [[graft.functions.Hyperplanes]] discipline) is a COMPILE-TIME
  * ±1/8-entry literal both engines share as text. Ailon–Chazelle's
  * analysis of exactly this H·D construction is what makes "energy
  * equidistributes" a theorem rather than a hope.
  *
  * EXACTNESS: every rotated coordinate is one shared-text 64-term
  * fixed-order dot against a ±1 literal row divided by 8.0 (a power
  * of two — the division is bit-exact), so both engines hold bitwise
  * identical rotated vectors; everything downstream is q69's already
  * hash-checked program. Orthonormality (R·Rᵀ = I, spec-pinned)
  * guarantees norms and cosines are preserved EXACTLY in real
  * arithmetic — the spec also pins that brute-force top-k in rotated
  * space equals top-k in the original space on the test corpus.
  *
  * Plan/scale: the rotation is a pure per-row projection (64 fused
  * dots — zero joins, zero shuffles, 4096 flops/row; production would
  * swap in the O(d log d) FWHT butterfly, which changes addition order
  * and therefore needs a tolerance audit instead of the hash gate —
  * the documented trade). The rest is q69's bounded plan verbatim.
  */
object Opq {

  /** Dimensionality (the Hadamard order — must be a power of two). */
  val Dim: Int = Ann.Dim

  /** 1/√Dim as the exact power-of-two divisor. */
  val Scale = 8.0

  /** Deterministic ±1 diagonal: md5-parity of "opq:j" (pure JVM —
    * signs are compile-time constants baked into BOTH engines' text,
    * no runtime hashing anywhere). */
  val DSigns: IndexedSeq[Double] = (0 until Dim).map { j =>
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"opq:$j".getBytes("UTF-8"))
    if ((h(15) & 1) == 0) 1.0 else -1.0
  }

  /** Row i of the un-normalized rotation: r_ij = D_j·(−1)^popcount(i&j).
    * Rows are mutually orthogonal with ‖row‖² = Dim, so R/[[Scale]] is
    * orthonormal. */
  def signRow(i: Int): IndexedSeq[Double] =
    (0 until Dim).map { j =>
      DSigns(j) * (if (Integer.bitCount(i & j) % 2 == 0) 1.0 else -1.0)
    }

  /** Rotate a (vec_id, embedding) frame: y_i = dot(v, row_i)/8 — a
    * pure projection keeping the input schema so the q69 program
    * consumes it unchanged. */
  def rotate(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), array((0 until Dim).map { i =>
        VectorMath.dot(col("v"), typedLit(signRow(i))) / lit(Scale)
      }: _*).as("embedding"))

  /** The rotation as leading oracle CTEs: a 64-row literal sign table
    * and the rotated source, `list(y ORDER BY i)` so array order
    * matches the Spark projection. */
  private def rotCtes: String = {
    val rows = (0 until Dim).map { i =>
      s"($i, CAST([${signRow(i).mkString(", ")}] AS DOUBLE[]))"
    }.mkString(", ")
    s"""rot AS (SELECT * FROM (VALUES $rows) t(i, r)),
       |remb AS MATERIALIZED (
       |  SELECT vec_id, list(y ORDER BY i) AS v FROM (
       |    SELECT e0.vec_id, r.i,
       |      ${VectorMath.dotSql("e0.v", "r.r", Dim)} / $Scale AS y
       |    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |          FROM embeddings) e0
       |    CROSS JOIN rot r)
       |  GROUP BY vec_id),
       |""".stripMargin
  }

  /** q265: the q69 ADC program over the rotated corpus. The rotated
    * frame is checkpointed — the q69 program scans its corpus many
    * times (fit rounds, encode, queries, re-rank), and recomputing 64
    * HOF dots per row per scan dominated the query (measured 28 s →
    * checkpointed ~q69-parity); production stores the rotated corpus
    * once for the same reason. */
  def annOpq(spark: SparkSession, dir: String): DataFrame =
    Pq.annPqFrame(
      rotate(Tables.embeddings(spark, dir)).localCheckpoint(true))

  /** DuckDB twin: the rotation CTEs feeding q69's builder verbatim. */
  val annOpqSql: String =
    Pq.annPqSqlFrom(rotCtes, "SELECT vec_id, v FROM remb")

  // ---------------- q266: PQ vs OPQ recall audit (q241 doctrine) ----------------

  /** One row comparing both compressed families against the SAME
    * brute-force truth: did the rotation buy recall at the identical
    * code budget (M, Ks, Rerank all shared)? recall_worst per family
    * per the q241 floor rationale. */
  def opqRecall(embeddings: DataFrame): DataFrame = {
    val emb = embeddings.localCheckpoint(true) // all three paths scan it
    val truth = Ann.annBrute(emb)
      .select("query_id", "neighbor_id").localCheckpoint(true)
    def hits(returned: DataFrame): DataFrame = {
      val perQuery = truth
        .join(returned.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id")
        .agg(expr("CAST(count(1) AS BIGINT)").as("n_hit_q"))
      truth.select("query_id").distinct()
        .join(perQuery, Seq("query_id"), "left")
        .selectExpr("coalesce(n_hit_q, CAST(0 AS BIGINT)) AS n_hit_q")
        .agg(expr("CAST(min(n_hit_q) AS BIGINT)").as("min_hit"),
          expr("CAST(sum(n_hit_q) AS BIGINT)").as("n_hit"),
          expr("CAST(count(1) AS BIGINT)").as("n_queries"))
    }
    val pq = hits(Pq.annPqFrame(emb))
      .selectExpr("n_queries", "n_hit AS hit_pq", "min_hit AS min_pq")
    val opq = hits(Pq.annPqFrame(rotate(emb).localCheckpoint(true)))
      .selectExpr("n_hit AS hit_opq", "min_hit AS min_opq")
    truth.agg(expr("CAST(count(1) AS BIGINT)").as("n_truth"))
      .crossJoin(pq).crossJoin(opq)
      .selectExpr("n_queries", s"CAST(${Ann.TopK} AS INT) AS k", "n_truth",
        "round(CAST(hit_pq AS DOUBLE)" +
          " / nullif(CAST(n_truth AS DOUBLE), 0e0), 6) + 0.0 AS recall_pq",
        "round(CAST(hit_opq AS DOUBLE)" +
          " / nullif(CAST(n_truth AS DOUBLE), 0e0), 6) + 0.0 AS recall_opq",
        s"round(CAST(min_pq AS DOUBLE) / ${Ann.TopK}.0, 6) + 0.0 AS worst_pq",
        s"round(CAST(min_opq AS DOUBLE) / ${Ann.TopK}.0, 6) + 0.0 AS worst_opq")
  }

  /** q266: measured PQ-vs-OPQ recall on the embeddings corpus. */
  def docOpqRecall(spark: SparkSession, dir: String): DataFrame =
    opqRecall(Tables.embeddings(spark, dir))

  /** DuckDB twin: q24, q69 and q265 statements verbatim as nested
    * subqueries, then the same counts per family. */
  val docOpqRecallSql: String =
    s"""WITH truth AS (
       |  SELECT query_id, neighbor_id
       |  FROM (${Ann.annBruteSql.replace("\n", " ")}) t),
       |retpq AS (
       |  SELECT query_id, neighbor_id
       |  FROM (${Pq.annPqSql.replace("\n", " ")}) r),
       |retopq AS (
       |  SELECT query_id, neighbor_id
       |  FROM (${annOpqSql.replace("\n", " ")}) r),
       |hitpq AS (
       |  SELECT q.query_id, CAST(count(h.neighbor_id) AS BIGINT) AS n_hit_q
       |  FROM (SELECT DISTINCT query_id FROM truth) q
       |  LEFT JOIN (
       |    SELECT t.query_id, t.neighbor_id
       |    FROM truth t JOIN retpq r
       |      ON t.query_id = r.query_id AND t.neighbor_id = r.neighbor_id) h
       |    ON q.query_id = h.query_id
       |  GROUP BY 1),
       |hitopq AS (
       |  SELECT q.query_id, CAST(count(h.neighbor_id) AS BIGINT) AS n_hit_q
       |  FROM (SELECT DISTINCT query_id FROM truth) q
       |  LEFT JOIN (
       |    SELECT t.query_id, t.neighbor_id
       |    FROM truth t JOIN retopq r
       |      ON t.query_id = r.query_id AND t.neighbor_id = r.neighbor_id) h
       |    ON q.query_id = h.query_id
       |  GROUP BY 1),
       |aggpq AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_queries,
       |    CAST(sum(n_hit_q) AS BIGINT) AS hit_pq,
       |    CAST(min(n_hit_q) AS BIGINT) AS min_pq
       |  FROM hitpq),
       |aggopq AS (
       |  SELECT CAST(sum(n_hit_q) AS BIGINT) AS hit_opq,
       |    CAST(min(n_hit_q) AS BIGINT) AS min_opq
       |  FROM hitopq),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth)
       |SELECT n_queries, CAST(${Ann.TopK} AS INT) AS k, n_truth,
       |  round(CAST(hit_pq AS DOUBLE)
       |    / nullif(CAST(n_truth AS DOUBLE), 0e0), 6) + 0.0 AS recall_pq,
       |  round(CAST(hit_opq AS DOUBLE)
       |    / nullif(CAST(n_truth AS DOUBLE), 0e0), 6) + 0.0 AS recall_opq,
       |  round(CAST(min_pq AS DOUBLE) / ${Ann.TopK}.0, 6) + 0.0 AS worst_pq,
       |  round(CAST(min_opq AS DOUBLE) / ${Ann.TopK}.0, 6) + 0.0 AS worst_opq
       |FROM aggpq, aggopq, tot""".stripMargin
}
