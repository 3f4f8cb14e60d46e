package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** LSH candidate-quality audit — the measurement the dedup ladder
  * itself was never subjected to: q20's MinHash banding is the SCALE
  * path and q22's PPJoin-filtered exact Jaccard is the TRUTH path,
  * but nothing reported how much of the truth the scale path actually
  * recovers. This operator joins the two and ships the two numbers a
  * dedup owner tunes bands/rows against:
  *
  *   recall          = |truth ∩ candidates| / |truth|
  *   precision_at_t  = |truth ∩ candidates| / |candidates|
  *
  * (truth = exact shingle-Jaccard pairs ≥ the shared q22 threshold;
  * candidates = q20's band buckets. A candidate below the threshold
  * is not "wrong" — banding is DESIGNED to over-generate — but
  * precision_at_t prices the verification pass that follows, and
  * recall is the miss rate that silently leaks duplicates at 100 TB.)
  *
  * Exactness: pure integer set counts — both sides' pair frames are
  * exact (the q20/q22 programs verbatim, shared constants), the
  * intersection is a semijoin, and the two rates are shared-text
  * divisions. Structurally guaranteed floor: an IDENTICAL pair shares
  * every minhash, hence every band — exact duplicates can never be
  * missed (spec-pinned).
  *
  * Plan/scale: both pair generators are the library's own bounded
  * paths (LSH buckets / prefix blocks — never all-pairs); the audit
  * adds two tiny pair-frame aggregates and one semijoin. */
object LshRecall {

  /** One row: (n_truth, n_candidates, n_hit, recall, precision_at_t). */
  def lshRecall(docs: DataFrame): DataFrame = {
    val d = docs.localCheckpoint(true) // both pair paths scan it
    val truth = PrefixJaccard.ngramJaccardPrefix(d)
      .select("doc_a", "doc_b").localCheckpoint(true)
    val cand = Dedup.dedupMinhash(d)
      .select("doc_a", "doc_b").localCheckpoint(true)
    val hit = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi")
    truth.agg(expr("CAST(count(1) AS BIGINT)").as("n_truth"))
      .crossJoin(cand.agg(
        expr("CAST(count(1) AS BIGINT)").as("n_candidates")))
      .crossJoin(hit.agg(expr("CAST(count(1) AS BIGINT)").as("n_hit")))
      .selectExpr("n_truth", "n_candidates", "n_hit",
        "round(CAST(n_hit AS DOUBLE)" +
          " / nullif(CAST(n_truth AS DOUBLE), 0e0), 6) + 0.0 AS recall",
        "round(CAST(n_hit AS DOUBLE)" +
          " / nullif(CAST(n_candidates AS DOUBLE), 0e0), 6) + 0.0" +
          " AS precision_at_t")
  }

  /** q234: how much of the exact near-dup truth does the MinHash
    * band path recover on this corpus — the audit that turns "we use
    * LSH" into a measured claim. */
  def docLshRecall(spark: SparkSession, dir: String): DataFrame =
    lshRecall(Tables.documents(spark, dir))

  /** DuckDB twin: the q20 bucket CTEs + the q22 exact chain (their
    * shared `th` CTE is textually identical, declared once), then the
    * same counts. */
  val docLshRecallSql: String = {
    val shingles = Dedup.shingleKeysSql("th", "text").replace("\n", " ")
    s"""WITH ${Dedup.bucketsCtesSql},
       |sh AS (SELECT doc_id, unnest($shingles) AS shk FROM th),
       |shk AS (SELECT DISTINCT doc_id, shk FROM sh),
       |counts AS (SELECT doc_id, count(*) AS n_sh FROM shk GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
       |  FROM shk a JOIN shk b ON a.shk = b.shk AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT doc_a, doc_b
       |  FROM inter
       |  JOIN counts ca ON doc_a = ca.doc_id
       |  JOIN counts cb ON doc_b = cb.doc_id
       |  WHERE n_inter * 1.0 / (ca.n_sh + cb.n_sh - n_inter)
       |    >= ${Dedup.JaccardThreshold}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM buckets a JOIN buckets b
       |    ON a.band = b.band AND a.band_key = b.band_key
       |    AND a.doc_id < b.doc_id),
       |hit AS (
       |  SELECT t.doc_a, t.doc_b FROM truth t
       |  JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b),
       |agg AS (
       |  SELECT
       |    (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
       |    (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
       |    (SELECT CAST(count(*) AS BIGINT) FROM hit) AS n_hit)
       |SELECT n_truth, n_candidates, n_hit,
       |  round(CAST(n_hit AS DOUBLE)
       |    / nullif(CAST(n_truth AS DOUBLE), 0e0), 6) + 0.0 AS recall,
       |  round(CAST(n_hit AS DOUBLE)
       |    / nullif(CAST(n_candidates AS DOUBLE), 0e0), 6) + 0.0
       |    AS precision_at_t
       |FROM agg""".stripMargin
  }
}
