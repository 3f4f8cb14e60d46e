package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.textstats.QualityModel

/** Average precision (area under the precision–recall curve) — the
  * EARLY-PRECISION companion of q83's ROC-AUC. AUC asks "does the
  * score rank a random positive above a random negative?" — a
  * prevalence-free question that looks healthy even when the top of
  * the ranking (the only part a corpus-curation cut actually keeps)
  * is polluted. AP re-weights the same ranking by the positives'
  * positions: AP = Σ_k P@k · rel_k / n_pos, so mistakes at the top
  * cost what they cost in production. Report both and you know the
  * scorer's ranking quality AND its usefulness at the cut.
  *
  * Tie convention (documented, deterministic): distinct scores form
  * BLOCKS, descending; every positive in a block is credited the
  * block-inclusive precision TP/N (the "pessimistic"/step convention —
  * within-block order never matters, so the result is a pure function
  * of the score cells and identical in both engines):
  *
  *   term(block) = (10⁶ · t · TP) div N      — t block positives,
  *   ap_micro    = (Σ terms) div n_pos         TP/N cumulative incl.
  *
  * All quantities exact Longs (10⁶·t·TP < 2⁶³ while rows ≲ 3·10⁶ —
  * the q83 bound; past that the sums swap to DECIMAL(38,0), same
  * plan). The prevalence n_pos·10⁶ div n is emitted beside it — AP's
  * no-skill baseline (AUC's is 0.5), without which the number can't
  * be read.
  *
  * Scale shape: ONE map-side-combined aggregate by score value, a
  * cumulative window over the DISTINCT-SCORE cell frame (the q83
  * allowlisted class — bounded by the quantized score grid, not the
  * corpus), one 1-row total. */
object AvgPrecision {

  /** Exact average precision of `score` predicting binary `label`.
    * @return one row: (n_pos, n_neg, ap_micro, base_micro) — ap NULL
    *         when there are no positives. */
  def apMicro(df: DataFrame, score: String, label: String): DataFrame = {
    val byScore = df
      .filter(col(score).isNotNull && col(label).isNotNull)
      .groupBy(col(score).as("s"))
      .agg(sum(col(label).cast("long")).as("np"), count(lit(1)).as("nt"))
    // block-inclusive cumulative TP / N, highest score first
    val w = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .withColumn("tp_cum", sum(col("np")).over(w))
      .withColumn("n_cum", sum(col("nt")).over(w))
      .withColumn("term", expr("(1000000 * np * tp_cum) div n_cum"))
      .agg(
        sum(col("np")).as("n_pos"),
        (sum(col("nt")) - sum(col("np"))).as("n_neg"),
        sum(col("term")).as("terms"))
      .selectExpr("n_pos", "n_neg",
        "terms div nullif(n_pos, 0) AS ap_micro",
        "(1000000 * n_pos) div (n_pos + n_neg) AS base_micro")
  }

  /** q171: early precision of the q61 hashed-feature quality score at
    * flagging English documents — the same frame q83 grades by AUC,
    * graded the way a top-slice corpus cut would feel it. */
  def qualityAp(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = QualityModel.qualityScore(docs)
      .join(docs.select(col("doc_id"), (col("lang") === "en").cast("int").as("y")),
        "doc_id")
    apMicro(scored, "score_sum", "y")
  }

  /** DuckDB twin: q61's exact score derivation, then the identical
    * block chain. */
  val qualityApSql: String = {
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
       |blocks AS (
       |  SELECT np, nt,
       |    CAST(sum(np) OVER (ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp_cum,
       |    CAST(sum(nt) OVER (ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_cum
       |  FROM by_score),
       |tot AS (
       |  SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       |    CAST(sum(nt) - sum(np) AS BIGINT) AS n_neg,
       |    CAST(sum((1000000 * np * tp_cum) // n_cum) AS BIGINT) AS terms
       |  FROM blocks)
       |SELECT n_pos, n_neg,
       |  terms // nullif(n_pos, 0) AS ap_micro,
       |  (1000000 * n_pos) // (n_pos + n_neg) AS base_micro
       |FROM tot""".stripMargin
  }
}
