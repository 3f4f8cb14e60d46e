package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** MinHash estimator-error audit — the second half of the q234
  * measurement: q234 audits candidate GENERATION (does banding find
  * the true pairs); this audits the ESTIMATOR ITSELF (how far is the
  * k-minhash match fraction from the exact Jaccard it estimates) on
  * the ground-truth pairs — the number that decides whether k = 16
  * signatures are enough before a threshold is tuned on them:
  *
  *   est(a,b) = |{i : mh_i(a) = mh_i(b)}| / k
  *   bias = mean(est − J),  mae = mean|est − J|
  *
  * Exactness: match counts are exact integers; the exact Jaccard per
  * truth pair is the q22 rational n∩/(n_a + n_b − n∩); each pair's
  * error terms are micro-floored (1e-6) and BIGINT-summed (q91 move);
  * the two means are shared-text divisions. No pair set besides the
  * PPJoin-bounded truth is ever materialized.
  *
  * Plan/scale: the q22 truth pairs (prefix-blocked, never all-pairs)
  * joined to the k-column signature frame on each side — two
  * hash joins on doc_id, one 1-row aggregate. */
object MinhashError {

  private val K = Dedup.MinhashK

  /** One row: (n_pairs, k_sig, mean_jaccard, mean_est, bias, mae). */
  def minhashError(docs: DataFrame): DataFrame = {
    val d = docs.localCheckpoint(true) // truth + signature paths scan it
    val truth = PrefixJaccard.ngramJaccardPrefix(d)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val sig = Dedup.minhashFrame(d).localCheckpoint(true) // joined twice
    val matchSum = (0 until K)
      .map(i => s"CASE WHEN a_mh$i = b_mh$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    val aCols = (0 until K).map(i => col(s"mh$i").as(s"a_mh$i"))
    val bCols = (0 until K).map(i => col(s"mh$i").as(s"b_mh$i"))
    truth
      .join(sig.select(col("doc_id").as("doc_a") +: aCols: _*), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b") +: bCols: _*), "doc_b")
      .selectExpr("jaccard",
        s"CAST(($matchSum) AS DOUBLE) / $K.0 AS est")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_pairs"),
        expr("CAST(sum(CAST(floor(jaccard * 1e6) AS BIGINT)) AS BIGINT)")
          .as("sj_i"),
        expr("CAST(sum(CAST(floor(est * 1e6) AS BIGINT)) AS BIGINT)")
          .as("se_i"),
        // SYMMETRIC rounding for the SIGNED bias (r13 ADVICE): a plain
        // floor rounds toward -inf for both signs, biasing the sum
        // downward by up to 1e-6 regardless of the true sign — fatal
        // for a quantity whose SIGN is the headline. floor(x + 0.5)
        // is the Periodogram trig-snap convention.
        expr("CAST(sum(CAST(floor((est - jaccard) * 1e6 + 0.5) AS BIGINT))" +
          " AS BIGINT)").as("sb_i"),
        expr("CAST(sum(CAST(floor(abs(est - jaccard) * 1e6) AS BIGINT))" +
          " AS BIGINT)").as("sa_i"))
      .selectExpr("n_pairs", s"CAST($K AS INT) AS k_sig",
        "round(CAST(sj_i AS DOUBLE) / 1e6" +
          " / nullif(CAST(n_pairs AS DOUBLE), 0e0), 6) + 0.0 AS mean_jaccard",
        "round(CAST(se_i AS DOUBLE) / 1e6" +
          " / nullif(CAST(n_pairs AS DOUBLE), 0e0), 6) + 0.0 AS mean_est",
        "round(CAST(sb_i AS DOUBLE) / 1e6" +
          " / nullif(CAST(n_pairs AS DOUBLE), 0e0), 6) + 0.0 AS bias",
        "round(CAST(sa_i AS DOUBLE) / 1e6" +
          " / nullif(CAST(n_pairs AS DOUBLE), 0e0), 6) + 0.0 AS mae")
  }

  /** q235: how well do the k = 16 signatures estimate exact Jaccard
    * on this corpus's true near-dup pairs — the estimator audit that
    * licenses (or indicts) threshold tuning on MinHash space. */
  def docMinhashError(spark: SparkSession, dir: String): DataFrame =
    minhashError(Tables.documents(spark, dir))

  /** DuckDB twin: the q20 signature CTEs + the q22 truth chain
    * (shared `th` declared once), identical floors. */
  val docMinhashErrorSql: String = {
    val shingles = Dedup.shingleKeysSql("th", "text").replace("\n", " ")
    val matchSum = (0 until K)
      .map(i => s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH ${Dedup.bucketsCtesSql},
       |sh AS (SELECT doc_id, unnest($shingles) AS shk FROM th),
       |shku AS (SELECT DISTINCT doc_id, shk FROM sh),
       |counts AS (SELECT doc_id, count(*) AS n_sh FROM shku GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
       |  FROM shku a JOIN shku b ON a.shk = b.shk AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT doc_a, doc_b,
       |    round(n_inter * 1.0 / (ca.n_sh + cb.n_sh - n_inter), 4) AS jaccard
       |  FROM inter
       |  JOIN counts ca ON doc_a = ca.doc_id
       |  JOIN counts cb ON doc_b = cb.doc_id
       |  WHERE n_inter * 1.0 / (ca.n_sh + cb.n_sh - n_inter)
       |    >= ${Dedup.JaccardThreshold}),
       |scored AS (
       |  SELECT t.jaccard,
       |    CAST(($matchSum) AS DOUBLE) / $K.0 AS est
       |  FROM truth t
       |  JOIN mh a ON t.doc_a = a.doc_id
       |  JOIN mh b ON t.doc_b = b.doc_id),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(CAST(floor(jaccard * 1e6) AS BIGINT)) AS BIGINT) AS sj_i,
       |    CAST(sum(CAST(floor(est * 1e6) AS BIGINT)) AS BIGINT) AS se_i,
       |    CAST(sum(CAST(floor((est - jaccard) * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
       |      AS sb_i,
       |    CAST(sum(CAST(floor(abs(est - jaccard) * 1e6) AS BIGINT))
       |      AS BIGINT) AS sa_i
       |  FROM scored)
       |SELECT n_pairs, CAST($K AS INT) AS k_sig,
       |  round(CAST(sj_i AS DOUBLE) / 1e6
       |    / nullif(CAST(n_pairs AS DOUBLE), 0e0), 6) + 0.0 AS mean_jaccard,
       |  round(CAST(se_i AS DOUBLE) / 1e6
       |    / nullif(CAST(n_pairs AS DOUBLE), 0e0), 6) + 0.0 AS mean_est,
       |  round(CAST(sb_i AS DOUBLE) / 1e6
       |    / nullif(CAST(n_pairs AS DOUBLE), 0e0), 6) + 0.0 AS bias,
       |  round(CAST(sa_i AS DOUBLE) / 1e6
       |    / nullif(CAST(n_pairs AS DOUBLE), 0e0), 6) + 0.0 AS mae
       |FROM agg""".stripMargin
  }
}
