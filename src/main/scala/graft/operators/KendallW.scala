package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kendall's coefficient of concordance W — the AGREEMENT readout of
  * the blocked-rank design: q177's Friedman χ² answers "is the
  * within-block ordering non-random?"; W rescales the same evidence
  * to [0, 1] ("how strongly do the b raters/blocks AGREE?"), the
  * number an annotation-quality report quotes — plus the classical
  * companion r̄ = (bW − 1)/(b − 1), the mean Spearman correlation
  * between all rater pairs.
  *
  *   W = χ²_F / (b·(k−1))   (tie-corrected, via the q177 statistic)
  *
  * Exactness: W and r̄ derive from q177's ALREADY-EXACT outputs
  * (chi2_f is round-4 snapped there), so the pair is two shared-text
  * divisions of agreed values — the cheapest possible cross-engine
  * parity. Degenerate designs inherit q177's NULLs.
  *
  * Plan/scale: q177's plan (calendar×level cells) plus a 1-row
  * projection. */
object KendallW {

  /** W + mean pairwise Spearman from the q177 Friedman row. */
  def kendallW(friedmanRow: DataFrame): DataFrame =
    friedmanRow.selectExpr("n_blocks", "b_dropped", "k_levels",
      "chi2_f",
      s"round($WSql, 6) + 0.0 AS kendall_w")
      .selectExpr("n_blocks", "b_dropped", "k_levels", "chi2_f",
        "kendall_w",
        s"round($RBarSql, 6) + 0.0 AS mean_spearman")

  private val WSql =
    "(CASE WHEN n_blocks < 1 OR k_levels < 2 THEN NULL" +
      " ELSE chi2_f / (CAST(n_blocks AS DOUBLE)" +
      " * (CAST(k_levels AS DOUBLE) - 1.0)) END)"
  private val RBarSql =
    "(CASE WHEN n_blocks < 2 THEN NULL" +
      " ELSE (CAST(n_blocks AS DOUBLE) * kendall_w - 1.0)" +
      " / (CAST(n_blocks AS DOUBLE) - 1.0) END)"

  /** q196: how strongly do the ship YEARS agree on the revenue
    * ordering of the five priorities? (The q177 frame read as an
    * agreement coefficient.) */
  def priorityYearConcordance(spark: SparkSession, dir: String): DataFrame =
    kendallW(Friedman.priorityYearFriedman(spark, dir))

  /** DuckDB twin: the q177 chain plus the two rescaling columns. */
  val priorityYearConcordanceSql: String =
    s"""WITH fried AS (
       |${Friedman.priorityYearFriedmanSql.linesIterator
         .map("  " + _).mkString("\n")}
       |),
       |ww AS (
       |  SELECT n_blocks, b_dropped, k_levels, chi2_f,
       |    round($WSql, 6) + 0.0 AS kendall_w
       |  FROM fried)
       |SELECT n_blocks, b_dropped, k_levels, chi2_f, kendall_w,
       |  round($RBarSql, 6) + 0.0 AS mean_spearman
       |FROM ww""".stripMargin
}
