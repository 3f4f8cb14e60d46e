package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Wald–Wolfowitz runs test — is a daily series' up/down movement
  * RANDOM, or does it trend/mean-revert? Too few runs = momentum
  * (regimes — hand the series to q134), too many = oscillation
  * (overcorrection, saw-tooth load). The randomness gate that decides
  * whether q111's ACF / q115's backtest deltas are even worth
  * reading, completing the hypothesis suite's sequence corner.
  *
  * Semantics: daily value sums per series; moves are the SIGNS of
  * day-over-day changes with zero-changes excluded (the classical
  * two-category reduction; exclusion documented — ties carry no
  * direction evidence); R = run count, z = (R − μ_R)/σ_R with the
  * exact n₁/n₂ moments, two-sided p via the shared Abramowitz–Stegun
  * erfc chain from the round-4-snapped z (q100 discipline);
  * one-direction series (σ_R = 0) yield NULL z via nullif.
  *
  * Exactness: counts R, n₁, n₂ are exact integers from integer
  * ten-thousandth daily sums; the moment formula is ONE shared-text
  * IEEE chain off those integers.
  *
  * Plan/scale: day cells → two stacked per-series ordered windows
  * (diff sign, then run boundary — same (k, d) spec, one sort) → one
  * rollup. Span-bounded partitions, no join.
  */
object RunsTest {

  private def pSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u" +
      s" - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
  }

  /** Per-series runs test over daily value sums. */
  def dailyRuns(events: DataFrame, keyCol: String, tsCol: String,
                valueCol: String): DataFrame = {
    events
      .select(col(keyCol).as("k"),
        expr(s"CAST(datediff(CAST($tsCol AS DATE), DATE'1970-01-01') AS BIGINT)")
          .as("d"),
        expr(s"CAST(floor(coalesce($valueCol, 0e0) * 10000) AS BIGINT)").as("vi"))
      .groupBy("k", "d")
      .agg(expr("CAST(sum(vi) AS BIGINT)").as("cv"))
      .selectExpr("k", "d", "cv",
        "CASE WHEN cv > lag(cv, 1) OVER (PARTITION BY k ORDER BY d) THEN 1" +
          " WHEN cv < lag(cv, 1) OVER (PARTITION BY k ORDER BY d) THEN -1" +
          " END AS move")
      .filter(col("move").isNotNull)
      .selectExpr("k", "move",
        "CASE WHEN lag(move, 1) OVER (PARTITION BY k ORDER BY d) IS NULL" +
          " OR move != lag(move, 1) OVER (PARTITION BY k ORDER BY d)" +
          " THEN 1 ELSE 0 END AS boundary")
      .groupBy("k")
      .agg(
        expr("CAST(sum(CASE WHEN move = 1 THEN 1 ELSE 0 END) AS BIGINT)")
          .as("n_up"),
        expr("CAST(sum(CASE WHEN move = -1 THEN 1 ELSE 0 END) AS BIGINT)")
          .as("n_down"),
        expr("CAST(sum(boundary) AS BIGINT)").as("runs"))
      .selectExpr("k", "n_up", "n_down", "runs",
        "CAST(n_up AS DOUBLE) AS n1d", "CAST(n_down AS DOUBLE) AS n2d",
        "CAST(runs AS DOUBLE) AS rd")
      .selectExpr("k", "n_up", "n_down", "runs",
        "round((rd - (2.0 * n1d * n2d / (n1d + n2d) + 1.0))" +
          " / nullif(sqrt(2.0 * n1d * n2d * (2.0 * n1d * n2d - n1d - n2d)" +
          " / ((n1d + n2d) * (n1d + n2d) * (n1d + n2d - 1.0))), 0e0)," +
          " 4) + 0.0 AS z")
      .selectExpr("k", "n_up", "n_down", "runs", "z",
        s"round(${pSql("z")}, 6) + 0.0 AS p_value")
  }

  /** q135: is each event type's daily value movement random? */
  def eventTypeRuns(spark: SparkSession, dir: String): DataFrame =
    dailyRuns(Tables.events(spark, dir), "event_type", "ts", "value")
      .withColumnRenamed("k", "event_type")

  val eventTypeRunsSql: String = {
    def p(z: String) = {
      val x = s"(abs($z) / 1.4142135623730951)"
      val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
      s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u" +
        s" - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
    }
    s"""WITH cells AS (
       |  SELECT event_type AS k,
       |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
       |      AS d,
       |    CAST(sum(CAST(floor(coalesce(value, 0e0) * 10000) AS BIGINT))
       |      AS BIGINT) AS cv
       |  FROM events GROUP BY 1, 2),
       |moves AS (
       |  SELECT k, d,
       |    CASE WHEN cv > lag(cv, 1) OVER (PARTITION BY k ORDER BY d) THEN 1
       |      WHEN cv < lag(cv, 1) OVER (PARTITION BY k ORDER BY d) THEN -1
       |      END AS move
       |  FROM cells),
       |bounds AS (
       |  SELECT k, move,
       |    CASE WHEN lag(move, 1) OVER (PARTITION BY k ORDER BY d) IS NULL
       |      OR move != lag(move, 1) OVER (PARTITION BY k ORDER BY d)
       |      THEN 1 ELSE 0 END AS boundary
       |  FROM moves WHERE move IS NOT NULL),
       |agg AS (
       |  SELECT k,
       |    CAST(sum(CASE WHEN move = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
       |    CAST(sum(CASE WHEN move = -1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_down,
       |    CAST(sum(boundary) AS BIGINT) AS runs
       |  FROM bounds GROUP BY 1),
       |zed AS (
       |  SELECT k, n_up, n_down, runs,
       |    round((CAST(runs AS DOUBLE)
       |      - (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
       |         / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)) + 1.0))
       |      / nullif(sqrt(2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
       |        * (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
       |           - CAST(n_up AS DOUBLE) - CAST(n_down AS DOUBLE))
       |        / ((CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
       |           * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
       |           * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE) - 1.0))),
       |        0e0), 4) + 0.0 AS z
       |  FROM agg)
       |SELECT k AS event_type, n_up, n_down, runs, z,
       |  round(${p("z")}, 6) + 0.0 AS p_value
       |FROM zed""".stripMargin
  }
}
