package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** IVF-PQ recall audit — q234's measurement doctrine applied to the
  * ANN family's production composition: q24's brute-force cosine
  * top-k is the TRUTH path and q145's IVFADC (probe → ADC shortlist →
  * exact re-rank) is the SCALE path; this reports how much of the
  * true neighborhood the compressed index actually returns. Beside
  * q234 (LSH vs exact Jaccard) the two audits bracket the engine's
  * approximate retrieval surface: "we run IVFADC at nProbe = 4" is a
  * tuning claim until recall is a measured number per corpus.
  *
  *   recall       = |truth ∩ returned| / |truth|   (both top-k sets)
  *   recall_worst = min over queries of |hit_q| / k — the per-query
  *                  floor, because an AVERAGE hides the one query
  *                  whose cell the probe set missed entirely.
  *
  * Exactness: both sides are the library's own deterministic programs
  * (shared constants, driver-fitted literal indexes), the
  * intersection is a semijoin on (query_id, neighbor_id), and every
  * reported rate is a shared-text division of exact counts.
  *
  * Plan/scale: the truth path is the audit's price (brute top-k —
  * QueryStride bounds the query set); the scale path is q145's own
  * bounded plan; the audit adds one semijoin and two tiny aggregates
  * over k·|queries|-row frames. */
object IvfPqRecall {

  /** The SHARED audit scaffold every single-family recall row rides
    * (q241 IVF-PQ, q313 HNSW, q347 SQ8 — one maintained program, not
    * three copies): semijoin `truth` (query_id, neighbor_id) against
    * `returned`, per-query hit counts RE-ANCHORED on the truth-side
    * query list so a fully-missed query reads 0 (not absent), then one
    * row (n_queries, k, n_truth, n_hit, recall, recall_worst) via
    * shared-text divisions. Callers checkpoint their own inputs. */
  private[ann] def recallAudit(truth: DataFrame,
      returned: DataFrame): DataFrame = {
    val perQuery = truth
      .join(returned, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_hit_q"))
    val queries = truth.select("query_id").distinct()
    val floor = queries
      .join(perQuery, Seq("query_id"), "left")
      .selectExpr("coalesce(n_hit_q, CAST(0 AS BIGINT)) AS n_hit_q")
      .agg(expr("CAST(min(n_hit_q) AS BIGINT)").as("min_hit"),
        expr("CAST(sum(n_hit_q) AS BIGINT)").as("n_hit"),
        expr("CAST(count(1) AS BIGINT)").as("n_queries"))
    truth.agg(expr("CAST(count(1) AS BIGINT)").as("n_truth"))
      .crossJoin(floor)
      .selectExpr("n_queries", s"CAST(${Ann.TopK} AS INT) AS k",
        "n_truth", "n_hit",
        "round(CAST(n_hit AS DOUBLE)" +
          " / nullif(CAST(n_truth AS DOUBLE), 0e0), 6) + 0.0 AS recall",
        s"round(CAST(min_hit AS DOUBLE) / ${Ann.TopK}.0, 6) + 0.0" +
          " AS recall_worst")
  }

  /** The matching DuckDB twin builder: `truthSql`/`retSql` nest
    * verbatim as subqueries, then the same count arithmetic. */
  private[ann] def recallAuditSql(truthSql: String, retSql: String): String =
    s"""WITH truth AS (
       |  SELECT query_id, neighbor_id
       |  FROM (${truthSql.replace("\n", " ")}) t),
       |ret AS (
       |  SELECT query_id, neighbor_id
       |  FROM (${retSql.replace("\n", " ")}) r),
       |hitq AS (
       |  SELECT q.query_id,
       |    CAST(count(h.neighbor_id) AS BIGINT) AS n_hit_q
       |  FROM (SELECT DISTINCT query_id FROM truth) q
       |  LEFT JOIN (
       |    SELECT t.query_id, t.neighbor_id
       |    FROM truth t JOIN ret r
       |      ON t.query_id = r.query_id AND t.neighbor_id = r.neighbor_id) h
       |    ON q.query_id = h.query_id
       |  GROUP BY 1),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_queries,
       |    CAST(sum(n_hit_q) AS BIGINT) AS n_hit,
       |    CAST(min(n_hit_q) AS BIGINT) AS min_hit
       |  FROM hitq),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth)
       |SELECT n_queries, CAST(${Ann.TopK} AS INT) AS k, n_truth, n_hit,
       |  round(CAST(n_hit AS DOUBLE)
       |    / nullif(CAST(n_truth AS DOUBLE), 0e0), 6) + 0.0 AS recall,
       |  round(CAST(min_hit AS DOUBLE) / ${Ann.TopK}.0, 6) + 0.0
       |    AS recall_worst
       |FROM agg, tot""".stripMargin

  /** One row: (n_queries, k, n_truth, n_hit, recall, recall_worst). */
  def ivfPqRecall(embeddings: DataFrame): DataFrame = {
    val emb = embeddings.localCheckpoint(true) // both paths scan it
    val truth = Ann.annBrute(emb)
      .select("query_id", "neighbor_id").localCheckpoint(true)
    val returned = IvfPq.annIvfAdc(emb, IvfPq.fit(emb))
      .select("query_id", "neighbor_id").localCheckpoint(true)
    recallAudit(truth, returned)
  }

  /** q241: measured IVFADC recall against brute-force truth on the
    * embeddings corpus. */
  def docIvfPqRecall(spark: SparkSession, dir: String): DataFrame =
    ivfPqRecall(Tables.embeddings(spark, dir))

  /** DuckDB twin: the q24 and q145 statements verbatim as nested
    * subqueries (each is self-contained), then the same counts. */
  val docIvfPqRecallSql: String =
    recallAuditSql(Ann.annBruteSql, IvfPq.annIvfPqSql)
}
