package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.textstats.QualityModel

/** Cumulative gains / lift table — the OPERATING-POINT companion of
  * q83's AUC and q171's average precision: AUC says whether the score
  * ranks well anywhere; the lift table says what you actually CAPTURE
  * if you keep the top decile, two, three — the table behind every
  * "filter the top-k% of the corpus by quality score" decision, read
  * as capture@decile and lift-over-random.
  *
  * Exactness: fully integral, end to end — score cells (the q83
  * aggregate), descending cumulative counts, and the q171 block
  * convention for ties: a whole score cell belongs to the decile of
  * its FIRST row, decile = 1 + (cumBefore·B) div N, so no tie is ever
  * split nondeterministically. Capture and lift ship as exact
  * micro-ratios via BIGINT floor division (the q83 auc_micro idiom) —
  * no doubles anywhere.
  *
  * Plan/scale: one corpus-touch aggregate by score value, a cumulative
  * window over the DISTINCT-SCORE frame (value-level, bounded by score
  * range — the q83 adjudication), then a B-row finish. */
object LiftGains {

  /** Gains/lift of `score` predicting binary `label` over `buckets`
    * descending-score blocks. Returns one row per non-empty bucket:
    * (decile, n_rows, n_pos, cum_pos, capture_micro, lift_micro) —
    * lift NULL when the positive class is empty. */
  def liftTable(df: DataFrame, score: String, label: String,
      buckets: Int = 10): DataFrame = {
    val byScore = df
      .filter(col(score).isNotNull && col(label).isNotNull)
      .groupBy(col(score).as("s"))
      .agg(sum(col(label).cast("long")).as("np"), count(lit(1)).as("nt"))
    val wDesc = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("cb", coalesce(sum(col("nt")).over(wDesc), lit(0L)))
      .withColumn("n_all", expr("CAST(sum(nt) OVER () AS BIGINT)"))
      .withColumn("decile",
        expr(s"1 + (cb * $buckets) div n_all"))
      .groupBy("decile")
      .agg(
        expr("CAST(sum(nt) AS BIGINT)").as("n_rows"),
        expr("CAST(sum(np) AS BIGINT)").as("n_pos"),
        expr("CAST(max(n_all) AS BIGINT)").as("n_all"))
      .withColumn("cum_pos", expr("CAST(sum(n_pos) OVER (ORDER BY decile" +
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"))
      .withColumn("pos_all", expr("CAST(sum(n_pos) OVER () AS BIGINT)"))
      .selectExpr("decile", "n_rows", "n_pos", "cum_pos",
        "CASE WHEN pos_all > 0 THEN (cum_pos * 1000000) div pos_all" +
          " ELSE NULL END AS capture_micro",
        "CASE WHEN pos_all > 0 THEN" +
          " (n_pos * n_all * 1000000) div (n_rows * pos_all)" +
          " ELSE NULL END AS lift_micro")
      .orderBy("decile")
  }

  /** q185: if the corpus keeps only its top quality-score deciles
    * (q61's scorer), what share of the English documents survive each
    * cut — and how concentrated is the scorer vs random? */
  def qualityLift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = QualityModel.qualityScore(docs)
      .join(docs.select(col("doc_id"),
        (col("lang") === "en").cast("int").as("y")), "doc_id")
    liftTable(scored, "score_sum", "y")
  }

  /** DuckDB twin: q61's exact score derivation, then the integral
    * decile walk. */
  val qualityLiftSql: String = {
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
       |walked AS (
       |  SELECT *,
       |    coalesce(CAST(sum(nt) OVER (ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      0) AS cb,
       |    CAST(sum(nt) OVER () AS BIGINT) AS n_all
       |  FROM by_score),
       |bucketed AS (
       |  SELECT 1 + (cb * 10) // n_all AS decile, np, nt, n_all
       |  FROM walked),
       |blocks AS (
       |  SELECT decile, CAST(sum(nt) AS BIGINT) AS n_rows,
       |    CAST(sum(np) AS BIGINT) AS n_pos,
       |    CAST(max(n_all) AS BIGINT) AS n_all
       |  FROM bucketed GROUP BY 1),
       |cum AS (
       |  SELECT *,
       |    CAST(sum(n_pos) OVER (ORDER BY decile
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum_pos,
       |    CAST(sum(n_pos) OVER () AS BIGINT) AS pos_all
       |  FROM blocks)
       |SELECT decile, n_rows, n_pos, cum_pos,
       |  CASE WHEN pos_all > 0 THEN (cum_pos * 1000000) // pos_all
       |    ELSE NULL END AS capture_micro,
       |  CASE WHEN pos_all > 0 THEN
       |    (n_pos * n_all * 1000000) // (n_rows * pos_all)
       |    ELSE NULL END AS lift_micro
       |FROM cum
       |ORDER BY decile""".stripMargin
  }
}
