package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Dickey–Fuller unit-root test (constant, no trend, lag 0) — the
  * question under every trend/changepoint reading in the deck
  * (q105/q134/q143/q174/q207): is this series MEAN-REVERTING (shocks
  * die out, a trend fit is meaningful) or a RANDOM WALK (shocks are
  * permanent, "trends" are spurious — the classic Granger–Newbold
  * trap)? Regress the first difference on the lagged level,
  *
  *   Δy_t = α + γ·y_{t−1} + ε_t,   H₀: γ = 0 (unit root)
  *
  * and report τ = γ̂/SE(γ̂). τ follows the DICKEY–FULLER distribution
  * under H₀, not Student t — so the operator reports the statistic
  * and the implied AR(1) coefficient (1 + γ̂), and documents the
  * classical 5% critical value (≈ −2.86 for the constant case) rather
  * than fabricating a normal p-value.
  *
  * Exactness: the lagged pairs (y_{t−1}, Δy_t) are built on the day
  * spine; the 2-var OLS runs on q32-convention fixed-point sums
  * (per-row products floored to the 1e-6 grid, summed DECIMAL(38,0) —
  * order-free), and γ/SE/τ are ONE shared-text rational+sqrt chain
  * (IEEE-exact ops only — nothing to snap).
  *
  * Plan/scale: one corpus-touch daily aggregate (q115 calendar-cell
  * class) → lag window PARTITIONED by group over the day spine → one
  * keyed sum aggregate → 1-row-per-group finish. Group count scales
  * freely; fact rows are touched once. */
object DickeyFuller {

  /** Fixed-point snap scale (q32/q207 convention). */
  val FixedScale = 1000000.0

  private val Terms: Seq[(String, String)] = Seq(
    "sx" -> "ylag", "sy" -> "dy", "sxx" -> "ylag * ylag",
    "sxy" -> "ylag * dy", "syy" -> "dy * dy")
  private def fixedSql(t: String): String =
    s"CAST(floor(($t) * $FixedScale) AS DECIMAL(38,0))"
  private def recExprs: Seq[String] = Terms.map { case (n, _) =>
    s"CAST(${n}_i AS DOUBLE) / $FixedScale AS $n"
  }
  private def recSql: String = recExprs.mkString(", ")

  private val Nd = "CAST(n_diffs AS DOUBLE)"
  /** Centered Sxx of the lagged level (shared text). */
  private val SxxSql = s"(sxx - sx * sx / $Nd)"
  private val SxySql = s"(sxy - sx * sy / $Nd)"
  private val SyySql = s"(syy - sy * sy / $Nd)"
  private val GuardSql =
    s"(n_diffs >= 3 AND abs($SxxSql) > 1.0 / $FixedScale)"

  /** DF test per group from a frame with (g, x, y): integer
    * observation order, double level. One row per group: (g, n_diffs,
    * gamma, ar1_coef, se_gamma, tau_df) — NULLs when degenerate
    * (fewer than 3 differences or a constant lagged level); se/tau
    * NULL on an exact fit. */
  def dfTest(rows: DataFrame): DataFrame = {
    val w = Window.partitionBy("g").orderBy("x")
    rows
      .filter(col("x").isNotNull && col("y").isNotNull)
      .selectExpr("g", "x", "CAST(y AS DOUBLE) AS y")
      .withColumn("ylag", lag("y", 1).over(w))
      .filter(col("ylag").isNotNull)
      .withColumn("dy", expr("y - ylag"))
      .groupBy("g")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_diffs"),
        Terms.map { case (n, t) =>
          expr(s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0))").as(s"${n}_i")
        }: _*)
      .selectExpr(Seq("g", "n_diffs") ++ recExprs: _*)
      .selectExpr("g", "n_diffs", SxySql + " AS cxy",
        SxxSql + " AS cxx", SyySql + " AS cyy",
        s"CASE WHEN $GuardSql THEN $SxySql / $SxxSql END AS gamma")
      .selectExpr("g", "n_diffs", "gamma", "cxx",
        // greatest(·,0) before sqrt: an exact fit's SSE can land a
        // hair negative off the snapped sums, and DuckDB ERRORS on a
        // negative sqrt where Spark would quietly NaN (q207 note)
        s"sqrt(nullif(greatest((cyy - gamma * cxy) / ($Nd - 2.0) / cxx," +
          " CAST(0.0 AS DOUBLE)), 0.0)) AS se_raw")
      .selectExpr("g", "n_diffs",
        "round(gamma, 6) + 0.0 AS gamma",
        "round(1.0 + gamma, 6) + 0.0 AS ar1_coef",
        "round(coalesce(se_raw, CAST(0.0 AS DOUBLE)), 6) + 0.0 AS se_gamma",
        "round(gamma / se_raw, 4) + 0.0 AS tau_df")
  }

  /** q210: is per-priority daily revenue mean-reverting or a random
    * walk — the q207 day-cell frame (y in k$); τ well below −2.86
    * reads "mean-reverting: trend fits on this series are
    * meaningful". */
  def dailyRevenueDf(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS d",
        "CAST(floor(o_totalprice * 1e2) AS BIGINT) AS cents")
      .groupBy("g", "d")
      .agg(expr("CAST(sum(cents) AS BIGINT)").as("rev"))
    dfTest(daily.selectExpr("g", "CAST(d AS BIGINT) AS x",
      "CAST(rev AS DOUBLE) / 1e5 AS y"))
      .withColumnRenamed("g", "o_orderpriority")
  }

  /** DuckDB twin: identical day cells, lag pairs, fixed-point sums,
    * shared γ/SE/τ chain. */
  val dailyRevenueDfSql: String = {
    val sums = Terms.map { case (n, t) =>
      s"CAST(sum(${fixedSql(t).replace("DECIMAL(38,0)", "HUGEINT")}) AS HUGEINT) AS ${n}_i"
    }.mkString(",\n       |    ")
    s"""WITH daily AS (
       |  SELECT o_orderpriority AS g,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
       |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS rev
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1, 2),
       |pts AS (
       |  SELECT g, d AS x, CAST(rev AS DOUBLE) / 1e5 AS y FROM daily),
       |lagged AS (
       |  SELECT g, y, lag(y) OVER (PARTITION BY g ORDER BY x) AS ylag
       |  FROM pts),
       |pairs AS (
       |  SELECT g, ylag, y - ylag AS dy FROM lagged WHERE ylag IS NOT NULL),
       |sums AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_diffs,
       |    $sums
       |  FROM pairs GROUP BY 1),
       |rec AS (SELECT g, n_diffs, $recSql FROM sums),
       |solved AS (
       |  SELECT g, n_diffs, $SxySql AS cxy, $SxxSql AS cxx, $SyySql AS cyy,
       |    CASE WHEN $GuardSql THEN $SxySql / $SxxSql END AS gamma
       |  FROM rec),
       |sed AS (
       |  SELECT g, n_diffs, gamma, cxx,
       |    sqrt(nullif(greatest((cyy - gamma * cxy) / ($Nd - 2.0) / cxx,
       |      CAST(0.0 AS DOUBLE)), 0.0)) AS se_raw
       |  FROM solved)
       |SELECT g AS o_orderpriority, n_diffs,
       |  round(gamma, 6) + 0.0 AS gamma,
       |  round(1.0 + gamma, 6) + 0.0 AS ar1_coef,
       |  round(coalesce(se_raw, CAST(0.0 AS DOUBLE)), 6) + 0.0 AS se_gamma,
       |  round(gamma / se_raw, 4) + 0.0 AS tau_df
       |FROM sed""".stripMargin
  }
}
