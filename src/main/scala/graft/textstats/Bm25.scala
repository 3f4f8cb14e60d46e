package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** BM25 ranked retrieval — the scoring function behind every classic
  * search/RAG candidate stack (Robertson–Spärck Jones probabilistic
  * model with tf saturation and length normalization), run as a batch
  * workload: a query set against the corpus, top-k per query. This is
  * the query-side consumer of [[InvertedIndex]]'s storage shape: the
  * tf probe below IS a postings lookup by term.
  *
  * Exactness: standard BM25 needs `ln` (idf) and real division — both
  * cross-engine hazards. As with q37's tfidf, idf uses the rational
  * surrogate (N+1)/(df+1) (same monotone ordering in df), and with
  * k1 = 6/5, b = 3/4 the whole per-term score clears to ONE integer
  * ratio:
  *
  *   score = (N+1)·tf·22·T  /  [ (df+1)·(10·T·tf + 3·T + 9·dl·N) ]
  *
  * (T = total corpus tokens, dl = doc length), emitted fixed-point as
  * `(num·1e6) div den` and SUMMED over query terms as exact Longs —
  * identical floor division in the DuckDB twin. Magnitude: the scaled
  * numerator (N+1)·tf·22·T·1e6 stays in Long while N·T·tf ≲ 4e11
  * (holds through sf0.1 with orders of headroom); a corpus past that
  * swaps the Longs for DECIMAL(38,0) sufficient terms — the q68
  * technique — with the same floor-division semantics.
  *
  * Scale shape: the query set is workload-dimension (broadcast); the
  * tf join on `term` is the postings probe; per-(query, doc) scores
  * partial-aggregate map-side; the final top-k is a window PARTITIONED
  * BY QUERY — parallel across queries, never a global sort. At true
  * scale the candidate set per query is bounded by WAND-style
  * impact-ordered pruning; here every posting of every query term is
  * scored (exact re-rank is the oracle anyway).
  */
object Bm25 {

  val TopK = 10

  /** Every `stride`-th document contributes its first `nTerms` words
    * as a query — deterministic, SF-independent workload derivation. */
  def deriveQueries(docs: DataFrame, stride: Long = 50L, nTerms: Int = 3): DataFrame =
    docs.filter(col("doc_id") % stride === 0)
      .select(col("doc_id").as("qid"),
        explode(slice(split(col("text"), " "), 1, nTerms)).as("term"))
      .distinct()

  /** BM25 top-k: (qid, doc_id, rk, score_micro). */
  def search(docs: DataFrame, queries: DataFrame, topK: Int = TopK): DataFrame = {
    // NOTE (round-9 audit): tf/dl ARE recomputed per consumer here —
    // checkpointing them was tried and MEASURED SLOWER (q82 1.4→2.0s,
    // q90 1.3→2.0s steady-state): materializing the (doc, term) tf
    // frame costs more than re-running the pipelined explode+aggregate.
    // The no-CSE fix only pays when the reused frame is much smaller
    // than its recompute (cells/per-entity aggregates), not here.
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(toks.agg(count(lit(1)).as("t_tokens")))
    val scored = broadcast(queries)
      .join(tf, "term") // the postings probe
      .join(df, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"),
        expr("((n_docs + 1) * tf * 22 * t_tokens * 1000000) div " +
          "((df + 1) * (10 * t_tokens * tf + 3 * t_tokens + 9 * dl * n_docs))")
          .as("s"))
      .groupBy("qid", "doc_id").agg(sum(col("s")).as("score_micro"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("qid"), col("doc_id"), col("rk"), col("score_micro"))
  }

  /** q82 over the documents table. */
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    search(docs, deriveQueries(docs))
  }

  /** q90: Mean Reciprocal Rank of the q82 run — the retrieval-eval
    * loop. Relevance is structural: each query was derived FROM a
    * document ([[deriveQueries]]), so that document is the known-item
    * target and `doc_id == qid` marks the hit. MRR = mean over queries
    * of 1/rank-of-target (0 when the target missed the top-k), in
    * exact micro fixed point (`1e6 div rk`, summed as Longs, one floor
    * division at the end — identical in the twin). One aggregate over
    * the top-k frame; query count is dimension-grade. */
  def mrr(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val queries = deriveQueries(docs)
    val res = search(docs, queries)
    val nq = queries.select("qid").distinct().count() // workload dimension
    res.agg(
      sum(when(col("doc_id") === col("qid"), expr("1000000 div rk"))
        .otherwise(lit(0L))).as("rr_sum"),
      sum(when(col("doc_id") === col("qid"), 1L).otherwise(0L)).as("n_hits"))
      .selectExpr(s"CAST($nq AS BIGINT) AS n_queries", "n_hits",
        s"rr_sum div $nq AS mrr_micro")
  }

  // lazy: textually references bm25Sql, which is defined below
  lazy val mrrSql: String =
    s"""WITH res AS (
       |${bm25Sql.linesIterator.map("  " + _).mkString("\n")}
       |),
       |nq AS (
       |  SELECT count(DISTINCT doc_id) AS n FROM documents WHERE doc_id % 50 = 0)
       |SELECT nq.n AS n_queries,
       |  CAST(sum(CASE WHEN res.doc_id = res.qid THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |  CAST(sum(CASE WHEN res.doc_id = res.qid THEN 1000000 // res.rk ELSE 0 END) AS BIGINT)
       |    // nq.n AS mrr_micro
       |FROM res CROSS JOIN nq
       |GROUP BY nq.n""".stripMargin

  val bm25Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |stats AS (
       |  SELECT (SELECT count(*) FROM documents) AS n_docs,
       |         (SELECT count(*) FROM toks) AS t_tokens),
       |queries AS (
       |  SELECT DISTINCT doc_id AS qid, unnest(string_split(text, ' ')[1:3]) AS term
       |  FROM documents WHERE doc_id % 50 = 0),
       |scored AS (
       |  SELECT q.qid, tf.doc_id,
       |    CAST(sum(((n_docs + 1) * tf * 22 * t_tokens * 1000000) //
       |      ((df + 1) * (10 * t_tokens * tf + 3 * t_tokens + 9 * dl.dl * n_docs)))
       |      AS BIGINT) AS score_micro
       |  FROM queries q
       |  JOIN tf ON tf.term = q.term
       |  JOIN df ON df.term = q.term
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats
       |  GROUP BY 1, 2)
       |SELECT qid, doc_id, rk, score_micro FROM (
       |  SELECT qid, doc_id, score_micro,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY score_micro DESC, doc_id) AS rk
       |  FROM scored)
       |WHERE rk <= $TopK""".stripMargin
}
