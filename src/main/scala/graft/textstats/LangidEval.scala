package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Language-ID confusion matrix — the MODEL-EVAL composition: q26
  * ships a heuristic classifier and q213 ships the generic confusion
  * operator; this row runs the REAL registered classifier against the
  * corpus labels and reports the full confusion structure (which
  * languages leak into which), not just q26's scalar is_match rate.
  * The q296/q297 doctrine applied to a MODEL: the oracle re-derives
  * the classifier decision for every document, so the hash match
  * certifies the deployed scoring path, not a reimplementation.
  *
  * Exactness: pure integer counts; row shares in exact ppm by integer
  * floor division.
  *
  * Plan/scale: q26's per-row projection (no shuffle) → one keyed cell
  * aggregate → a languages²-bounded window for row totals. */
object LangidEval {

  /** q305: confusion cells of q26's prediction vs the corpus label:
    * (actual, predicted, n_docs, row_share_ppm). */
  def langidConfusion(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cells = TextStats.langid(docs)
      .select("doc_id", "pred_lang")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .filter(col("lang").isNotNull)
      .groupBy(col("lang").as("actual"), col("pred_lang").as("predicted"))
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_docs"))
    cells
      .withColumn("row_total",
        sum("n_docs").over(Window.partitionBy("actual")))
      .selectExpr("actual", "predicted", "n_docs",
        "n_docs * 1000000 div row_total AS row_share_ppm")
  }

  /** DuckDB twin: q26's full derivation embedded verbatim (one
    * maintained classifier), rejoined to labels. */
  val langidConfusionSql: String =
    s"""WITH li AS (
       |${TextStats.langidSql}
       |),
       |cells AS (
       |  SELECT d.lang AS actual, li.pred_lang AS predicted,
       |    CAST(count(*) AS BIGINT) AS n_docs
       |  FROM li JOIN documents d USING (doc_id)
       |  WHERE d.lang IS NOT NULL
       |  GROUP BY 1, 2)
       |SELECT actual, predicted, n_docs,
       |  n_docs * 1000000 // CAST(sum(n_docs) OVER (PARTITION BY actual)
       |    AS BIGINT) AS row_share_ppm
       |FROM cells""".stripMargin
}
