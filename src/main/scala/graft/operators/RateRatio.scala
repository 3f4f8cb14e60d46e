package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Two-period Poisson rate comparison — the INFERENCE rung under the
  * event deck's rate readouts: q118 shows cadence, q189 checks the
  * Poisson assumption; this answers "did the arrival RATE change
  * between two exposure windows?" with the classical conditional
  * binomial test (given N = x₁+x₂ total events, x₁ ~ Bin(N, e₁/e))
  * plus the rate ratio and its log-scale Wald CI — the effect size a
  * capacity report quotes, not just a verdict.
  *
  *   z = (x₁ − N·p) / √(N·p·(1−p)),  p = e₁/(e₁+e₂)
  *   ln RR ± 1.96·√(1/x₁ + 1/x₂)
  *
  * Exactness: exposures and counts are exact BIGINTs; z is ONE
  * shared-text double; ln RR is snapped to the nano-nat grid before
  * the CI arithmetic (the q110 ln discipline); empty sides (x = 0)
  * NULL the ratio chain via nullif, never crash it.
  *
  * Plan/scale: one scan → per-(group, period) counting aggregate
  * (dimension-grade) → conditional pivot → 1-row-per-group finish.
  * The period split is an exact integer midpoint of the day spine. */
object RateRatio {

  /** Rate test per group from a frame (g, period, e, x): period ∈
    * {1, 2} with exposure e and event count x (one row per group ×
    * period). Returns one row per group: (g, e1, e2, x1, x2, rate1,
    * rate2, rate_ratio, z, p_value, rr_lo, rr_hi). */
  def rateTest(cells: DataFrame): DataFrame = {
    cells.groupBy("g")
      .agg(
        expr("CAST(max(CASE WHEN period = 1 THEN e END) AS BIGINT)")
          .as("e1"),
        expr("CAST(max(CASE WHEN period = 2 THEN e END) AS BIGINT)")
          .as("e2"),
        expr("CAST(max(CASE WHEN period = 1 THEN x END) AS BIGINT)")
          .as("x1"),
        expr("CAST(max(CASE WHEN period = 2 THEN x END) AS BIGINT)")
          .as("x2"))
      .selectExpr("g", "e1", "e2", "x1", "x2",
        s"round($Rate1Sql, 6) + 0.0 AS rate1",
        s"round($Rate2Sql, 6) + 0.0 AS rate2",
        s"round($RrSql, 6) + 0.0 AS rate_ratio",
        s"round($ZSql, 4) + 0.0 AS z",
        s"$LnRrSql AS lnrr", s"$SeLnSql AS se_ln")
      .selectExpr("g", "e1", "e2", "x1", "x2", "rate1", "rate2",
        "rate_ratio", "z",
        s"round(${pTwoSidedSql("z")}, 6) + 0.0 AS p_value",
        "round(CAST(floor(exp(lnrr - 1.96 * se_ln) * 1e9 + 5e-1)" +
          " AS DOUBLE) / 1e9, 6) + 0.0 AS rr_lo",
        "round(CAST(floor(exp(lnrr + 1.96 * se_ln) * 1e9 + 5e-1)" +
          " AS DOUBLE) / 1e9, 6) + 0.0 AS rr_hi")
  }

  private val Rate1Sql =
    "(CAST(x1 AS DOUBLE) / nullif(CAST(e1 AS DOUBLE), 0.0))"
  private val Rate2Sql =
    "(CAST(x2 AS DOUBLE) / nullif(CAST(e2 AS DOUBLE), 0.0))"
  private val RrSql = s"($Rate1Sql / nullif($Rate2Sql, 0.0))"
  private val ZSql = {
    val p = "(CAST(e1 AS DOUBLE) / (CAST(e1 AS DOUBLE)" +
      " + CAST(e2 AS DOUBLE)))"
    val n = "(CAST(x1 AS DOUBLE) + CAST(x2 AS DOUBLE))"
    s"((CAST(x1 AS DOUBLE) - $n * $p)" +
      s" / nullif(sqrt($n * $p * (1.0 - $p)), 0.0))"
  }
  // nano-snapped ln RR (NULL when either count is 0)
  private val LnRrSql =
    s"(CASE WHEN x1 > 0 AND x2 > 0 THEN" +
      s" CAST(floor(ln($RrSql) * 1e9 + 5e-1) AS BIGINT) / 1e9" +
      s" ELSE NULL END)"
  // guarded: a zero count must NULL, not trip the ANSI division path
  private val SeLnSql =
    "(CASE WHEN x1 > 0 AND x2 > 0 THEN" +
      " sqrt(1.0 / CAST(x1 AS DOUBLE) + 1.0 / CAST(x2 AS DOUBLE))" +
      " ELSE NULL END)"

  /** Two-sided normal p via the A&S 7.1.26 erfc chain. */
  private def pTwoSidedSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"((((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u" +
      s" - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x))))"
  }

  /** q198: did each priority's daily order arrival rate change between
    * the first and second half of the observed calendar? The split
    * day is the exact integer midpoint of the global day spine. */
  def priorityRateShift(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_orderpriority").isNotNull)
      .selectExpr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS d")
      .localCheckpoint(true) // feeds the spine bounds AND the counts
    val bounds = days.agg(
      expr("CAST(min(d) AS BIGINT)").as("d_lo"),
      expr("CAST(max(d) AS BIGINT)").as("d_hi"))
      .selectExpr("d_lo", "d_hi", "(d_lo + d_hi) div 2 AS d_mid")
    val cells = days.crossJoin(broadcast(bounds))
      .selectExpr("g", "CASE WHEN d <= d_mid THEN 1 ELSE 2 END AS period",
        "CASE WHEN d <= d_mid THEN d_mid - d_lo + 1" +
          " ELSE d_hi - d_mid END AS e")
      .groupBy("g", "period")
      .agg(expr("CAST(max(e) AS BIGINT)").as("e"),
        expr("CAST(count(1) AS BIGINT)").as("x"))
    rateTest(cells).withColumnRenamed("g", "o_priority").orderBy("o_priority")
  }

  /** DuckDB twin: identical midpoint split and chain. */
  val priorityRateShiftSql: String =
    s"""WITH days AS (
       |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL),
       |bounds AS (
       |  SELECT min(d) AS d_lo, max(d) AS d_hi,
       |    (min(d) + max(d)) // 2 AS d_mid
       |  FROM days),
       |cells AS (
       |  SELECT g, CASE WHEN d <= d_mid THEN 1 ELSE 2 END AS period,
       |    CAST(max(CASE WHEN d <= d_mid THEN d_mid - d_lo + 1
       |      ELSE d_hi - d_mid END) AS BIGINT) AS e,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM days CROSS JOIN bounds
       |  GROUP BY 1, 2),
       |pivoted AS (
       |  SELECT g,
       |    CAST(max(CASE WHEN period = 1 THEN e END) AS BIGINT) AS e1,
       |    CAST(max(CASE WHEN period = 2 THEN e END) AS BIGINT) AS e2,
       |    CAST(max(CASE WHEN period = 1 THEN x END) AS BIGINT) AS x1,
       |    CAST(max(CASE WHEN period = 2 THEN x END) AS BIGINT) AS x2
       |  FROM cells GROUP BY 1),
       |mid AS (
       |  SELECT g, e1, e2, x1, x2,
       |    round($Rate1Sql, 6) + 0.0 AS rate1,
       |    round($Rate2Sql, 6) + 0.0 AS rate2,
       |    round($RrSql, 6) + 0.0 AS rate_ratio,
       |    round($ZSql, 4) + 0.0 AS z,
       |    $LnRrSql AS lnrr, $SeLnSql AS se_ln
       |  FROM pivoted)
       |SELECT g AS o_priority, e1, e2, x1, x2, rate1, rate2, rate_ratio, z,
       |  round(${pTwoSidedSql("z")}, 6) + 0.0 AS p_value,
       |  round(CAST(floor(exp(lnrr - 1.96 * se_ln) * 1e9 + 5e-1)
       |    AS DOUBLE) / 1e9, 6) + 0.0 AS rr_lo,
       |  round(CAST(floor(exp(lnrr + 1.96 * se_ln) * 1e9 + 5e-1)
       |    AS DOUBLE) / 1e9, 6) + 0.0 AS rr_hi
       |FROM mid
       |ORDER BY o_priority""".stripMargin
}
