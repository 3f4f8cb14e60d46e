package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.textstats.QualityModel

/** Classifier evaluation — EXACT ROC-AUC via the Mann–Whitney rank
  * statistic, the metric every corpus-quality filter ([[QualityModel]],
  * [[graft.textstats.Dsir]]) is judged by before it gates a corpus.
  * AUC = P(score⁺ > score⁻) + ½·P(tie), computed from tie-corrected
  * rank sums — never from a sampled curve.
  *
  * Exactness: with integer scores, every quantity is integral: per
  * distinct score s, `2·avgRank(s) = 2·cumBefore(s) + n(s) + 1`
  * (the q68 Spearman trick), so
  *
  *   2·U⁺ = Σ_s n⁺(s)·(2·cumBefore(s) + n(s) + 1) − n⁺·(n⁺+1)
  *   auc_micro = (2·U⁺ · 1e6) div (2 · n⁺ · n⁻)
  *
  * — one exact Long chain, identical floor division in the twin.
  * (Longs hold while rows·rows·1e6 < 2^63; past ~3e6 rows swap the
  * sums for DECIMAL(38,0), the q68 technique, same plan.)
  *
  * Scale shape: ONE map-side-combined aggregate by score value, then a
  * cumulative window over the DISTINCT-SCORE frame — value-level, its
  * cardinality bounded by the score range (q68 precedent), never the
  * corpus — then a single-row total. The corpus is touched once.
  */
object Eval {

  /** Exact AUC of `score` predicting binary `label` (0/1). Rows with
    * a NULL score or label are excluded up front (the standard eval
    * convention — and necessary for parity, since Spark sorts NULLs
    * first where DuckDB sorts them last, which would silently shift
    * every cumulative rank).
    * @return one row: (n_pos, n_neg, auc_micro) — auc_micro NULL when
    *         a class is empty (AUC undefined). */
  def aucMicro(df: DataFrame, score: String, label: String): DataFrame = {
    val byScore = df
      .filter(col(score).isNotNull && col(label).isNotNull)
      .groupBy(col(score).as("s"))
      .agg(sum(col(label).cast("long")).as("np"), count(lit(1)).as("nt"))
    // cumulative count of strictly-smaller scores; the global window
    // runs over the value-level aggregate (distinct scores), not rows
    val w = Window.orderBy(col("s")).rowsBetween(Window.unboundedPreceding, -1)
    byScore.withColumn("cb", coalesce(sum(col("nt")).over(w), lit(0L)))
      .agg(
        sum(col("np")).as("n_pos"),
        (sum(col("nt")) - sum(col("np"))).as("n_neg"),
        sum(col("np") * (lit(2L) * col("cb") + col("nt") + lit(1L))).as("r2"))
      .selectExpr("n_pos", "n_neg",
        "CASE WHEN n_pos > 0 AND n_neg > 0 THEN " +
          "((r2 - n_pos * (n_pos + 1)) * 1000000) div (2 * n_pos * n_neg) " +
          "ELSE NULL END AS auc_micro")
  }

  /** q83: does the hashed-feature quality score (q61) separate English
    * documents? Score = q61's exact integer score_sum, label = corpus
    * lang tag — the eval loop a production filter runs before gating. */
  def qualityAuc(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = QualityModel.qualityScore(docs)
      .join(docs.select(col("doc_id"), (col("lang") === "en").cast("int").as("y")),
        "doc_id")
    aucMicro(scored, "score_sum", "y")
  }

  val qualityAucSql: String = {
    // reuse q61's exact score derivation, then the rank-sum chain
    val hash = graft.functions.Hashing.hash48Sql("tok")
    val weight = graft.functions.Hashing.hash48Sql(
      s"'${QualityModel.FeatureSeed}:' || ($hash % ${QualityModel.Buckets})::VARCHAR")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |docscore AS (
       |  SELECT doc_id, CAST(sum($weight % 1001 - 500) AS BIGINT) AS s
       |  FROM toks GROUP BY 1),
       |labeled AS (
       |  SELECT ds.s, CAST(d.lang = 'en' AS INT) AS y
       |  FROM documents d JOIN docscore ds USING (doc_id)),
       |by_score AS (
       |  SELECT s, CAST(sum(y) AS BIGINT) AS np, count(*) AS nt
       |  FROM labeled GROUP BY 1),
       |ranked AS (
       |  SELECT *, coalesce(CAST(sum(nt) OVER (ORDER BY s
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cb
       |  FROM by_score),
       |tot AS (
       |  SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       |    CAST(sum(nt) - sum(np) AS BIGINT) AS n_neg,
       |    CAST(sum(np * (2 * cb + nt + 1)) AS BIGINT) AS r2
       |  FROM ranked)
       |SELECT n_pos, n_neg,
       |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
       |    ((r2 - n_pos * (n_pos + 1)) * 1000000) // (2 * n_pos * n_neg)
       |  ELSE NULL END AS auc_micro
       |FROM tot""".stripMargin
  }
}
