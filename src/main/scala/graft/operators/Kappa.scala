package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cohen's kappa — chance-corrected agreement between two binary
  * labelers: raw agreement (q11's dup-rate flavor of "how often do
  * they match") is inflated by marginal prevalence; kappa subtracts
  * the agreement two INDEPENDENT labelers with the same margins
  * would produce. The label-quality primitive for any pipeline that
  * double-annotates (LLM judge vs heuristic, old model vs new) —
  * and the categorical complement of q101's Kendall (ordinal) and
  * q91's χ² (association without an agreement direction).
  *
  * Semantics: 2×2 agreement over row-level predicates A and B; a
  * predicate that evaluates NULL counts as FALSE (CASE-ELSE in both
  * engines — the oracle twin coalesces its negations so NULL rows
  * land in the same cell on both sides).
  *
  * Exactness: the entire statistic is ONE integer-cleared rational —
  * κ = (n·(n₁₁+n₀₀) − (r₁c₁+r₀c₀)) / (n² − (r₁c₁+r₀c₀)) with all
  * products DECIMAL(38,0) off exact cell counts, one shared-text
  * divide at the end; a degenerate margin (pe = 1: both labelers
  * constant) yields NULL via nullif, not 0/0.
  *
  * Plan/scale: one conditional map-side-combined aggregate over the
  * fact — 4 cells in, 1 row out; no window, no join, no second scan.
  */
object Kappa {

  /** κ between two boolean expressions over a frame. */
  def cohenKappa(df: DataFrame, exprA: String, exprB: String): DataFrame = {
    df
      .selectExpr(s"CASE WHEN ($exprA) THEN 1 ELSE 0 END AS a",
        s"CASE WHEN ($exprB) THEN 1 ELSE 0 END AS b")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n"),
        expr("CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)")
          .as("n11"),
        expr("CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)")
          .as("n00"),
        expr("CAST(sum(a) AS BIGINT)").as("r1"),
        expr("CAST(sum(b) AS BIGINT)").as("c1"))
      .selectExpr("n", "n11", "n00", "r1", "c1",
        "CAST(CAST(r1 AS DECIMAL(38,0)) * c1" +
          " + CAST(n - r1 AS DECIMAL(38,0)) * (n - c1) AS DECIMAL(38,0)) AS ec")
      .selectExpr("n", "n11", "n00", "r1", "c1",
        "round(CAST(n11 + n00 AS DOUBLE) / nullif(CAST(n AS DOUBLE), 0e0)," +
          " 6) + 0.0 AS p_observed",
        "round(CAST(ec AS DOUBLE)" +
          " / nullif(CAST(CAST(n AS DECIMAL(38,0)) * n AS DOUBLE), 0e0)," +
          " 6) + 0.0 AS p_expected",
        "round(CAST(CAST(n AS DECIMAL(38,0)) * (n11 + n00) - ec AS DOUBLE)" +
          " / nullif(CAST(CAST(n AS DECIMAL(38,0)) * n - ec AS DOUBLE), 0e0)," +
          " 6) + 0.0 AS kappa")
  }

  /** q136: do the return flag and line status "labelers" agree beyond
    * their margins on lineitem? */
  def lineitemKappa(spark: SparkSession, dir: String): DataFrame =
    cohenKappa(Tables.lineitem(spark, dir),
      "l_returnflag = 'R'", "l_linestatus = 'F'")

  val lineitemKappaSql: String =
    """WITH cells AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN coalesce(l_returnflag = 'R', false)
      |      AND coalesce(l_linestatus = 'F', false)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n11,
      |    CAST(sum(CASE WHEN NOT coalesce(l_returnflag = 'R', false)
      |      AND NOT coalesce(l_linestatus = 'F', false)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n00,
      |    CAST(sum(CASE WHEN coalesce(l_returnflag = 'R', false)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS r1,
      |    CAST(sum(CASE WHEN coalesce(l_linestatus = 'F', false)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS c1
      |  FROM lineitem),
      |ex AS (
      |  SELECT *, CAST(CAST(r1 AS HUGEINT) * c1
      |    + CAST(n - r1 AS HUGEINT) * (n - c1) AS HUGEINT) AS ec
      |  FROM cells)
      |SELECT n, n11, n00, r1, c1,
      |  round(CAST(n11 + n00 AS DOUBLE) / nullif(CAST(n AS DOUBLE), 0e0),
      |    6) + 0.0 AS p_observed,
      |  round(CAST(ec AS DOUBLE)
      |    / nullif(CAST(CAST(n AS HUGEINT) * n AS DOUBLE), 0e0),
      |    6) + 0.0 AS p_expected,
      |  round(CAST(CAST(n AS HUGEINT) * (n11 + n00) - ec AS DOUBLE)
      |    / nullif(CAST(CAST(n AS HUGEINT) * n - ec AS DOUBLE), 0e0),
      |    6) + 0.0 AS kappa
      |FROM ex""".stripMargin
}
