package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Simple-exponential-smoothing backtest — the BAKE-OFF partner of
  * q272. An AR(2) (q272) bets on short autocorrelation structure; SES
  * bets the series is a drifting LEVEL plus noise. Running both
  * through the identical holdout (same split, same naive scaling,
  * same MASE/sMAPE floors) turns "which forecaster?" into one row
  * comparison per group — the minimal honest model-selection loop.
  *
  * Predictor: the order-J truncated SES expansion
  *
  *   ŷ_t = Σ_{j=1..J} α(1−α)^{j−1}·y_{t−j}  /  (1 − (1−α)^J)
  *
  * with α = 0.3, J = 20 — the renormalized tail carries < 0.08% of
  * the level (0.7²⁰ ≈ 8.0e-4), far below the round-4 metric grid;
  * truncation makes the forecast a PURE 20-lag linear form, which is
  * what makes bit-parity possible at all (the recursive form would
  * accumulate engine-ordered rounding).
  *
  * Exactness: the weights are EXACT decimal literals (BigDecimal
  * 0.3·0.7^(j−1), printed in full and embedded in both engines' text,
  * so both parse the identical doubles); lags are exact BIGINTs; ŷ is
  * ONE shared-text dot product; MASE/sMAPE ride q272's micro-floored
  * integer sums verbatim.
  *
  * Plan/scale: q272's shape — day cells, per-group lag windows over
  * the cell frame, three keyed aggregates. The 20 lags are one window
  * pass (same frame, 20 offsets), value-level. */
object Ses {

  val Alpha = BigDecimal("0.3")
  val Lags = 20

  /** Exact decimal weight literals α·(1−α)^(j−1), j = 1..J. */
  private val Weights: Seq[BigDecimal] =
    (1 to Lags).map(j => Alpha * BigDecimal("0.7").pow(j - 1))
  private val WTot: BigDecimal = Weights.sum

  /** Shared-text truncated-SES dot product over lag columns l1..lJ
    * (public: q310's coverage audit reuses the predictor verbatim). */
  val XhatSqlText: String =
    "((" + Weights.zipWithIndex.map { case (w, i) =>
      s"$w * CAST(l${i + 1} AS DOUBLE)"
    }.mkString(" + ") + s") / $WTot)"

  private def allLagsSql(prefix: String = ""): String =
    (1 to Lags).map(j => s"${prefix}l$j IS NOT NULL").mkString(" AND ")

  /** SES backtest from (g, t, x): q272's contract. One row per group:
    * (g, n_train, n_test, alpha, mase, smape). */
  def sesBacktest(series: DataFrame): DataFrame = {
    val daily = series.select("g", "t", "x").localCheckpoint(true)
    val span = daily.groupBy("g")
      .agg(expr("CAST(max(t) AS BIGINT)").as("tmax"))
    val w = Window.partitionBy("g").orderBy("t")
    val walked = (1 to Lags).foldLeft(
      daily.join(broadcast(span), "g")
        .withColumn("is_test", expr(s"t > tmax - ${YuleWalker.TestDays}"))) {
      case (df, j) => df.withColumn(s"l$j", lag("x", j).over(w))
    }.localCheckpoint(true) // train count + naive + forecast read it
    val fit = walked.filter(!col("is_test"))
      .groupBy("g").agg(expr("CAST(count(1) AS BIGINT)").as("n_train"))
    val naive = walked.filter(!col("is_test") && col("l1").isNotNull)
      .groupBy("g").agg(
        expr("CAST(sum(abs(x - l1)) AS DECIMAL(38,0))").as("snaive"),
        expr("CAST(count(1) AS BIGINT)").as("n_naive"))
    val test = walked
      .filter(col("is_test") && expr(allLagsSql()))
      .selectExpr("g", "x", s"$XhatSqlText AS xhat")
      .selectExpr("g",
        "CAST(floor(abs(xhat - CAST(x AS DOUBLE)) * 1e2) AS DECIMAL(38,0)) AS ae_i",
        "CAST(floor(2e0 * abs(xhat - CAST(x AS DOUBLE))" +
          " / nullif(abs(xhat) + abs(CAST(x AS DOUBLE)), 0e0) * 1e9)" +
          " AS DECIMAL(38,0)) AS sm_i")
      .groupBy("g").agg(
        expr("CAST(sum(ae_i) AS DECIMAL(38,0))").as("sae"),
        expr("CAST(sum(sm_i) AS DECIMAL(38,0))").as("ssm"),
        expr("CAST(count(1) AS BIGINT)").as("n_test"))
    fit.join(naive, "g").join(test, "g")
      .selectExpr("g", "n_train", "n_test",
        s"CAST($Alpha AS DOUBLE) AS alpha",
        "round((CAST(sae AS DOUBLE) / 1e2 / CAST(n_test AS DOUBLE))" +
          " / nullif(CAST(snaive AS DOUBLE) / CAST(n_naive AS DOUBLE), 0e0), 4)" +
          " + 0.0 AS mase",
        "round(CAST(ssm AS DOUBLE) / 1e9 / CAST(n_test AS DOUBLE), 4)" +
          " + 0.0 AS smape")
  }

  /** q289: SES on q272's EXACT series and split — read the two rows
    * side by side to pick the production forecaster per priority. */
  def dailyRevenueSesBacktest(spark: SparkSession, dir: String): DataFrame =
    sesBacktest(Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS t",
        "CAST(floor(o_totalprice) AS BIGINT) AS usd")
      .groupBy("g", "t")
      .agg(expr("CAST(sum(usd) AS BIGINT)").as("x")))
      .withColumnRenamed("g", "o_orderpriority")

  /** DuckDB twin: identical split, lag bank, literal weights, micro
    * floors. */
  val dailyRevenueSesBacktestSql: String = {
    val lagDefs = (1 to Lags).map(j =>
      s"lag(x, $j) OVER (PARTITION BY d.g ORDER BY t) AS l$j")
      .mkString(",\n       |    ")
    s"""WITH daily AS (
       |  SELECT o_orderpriority AS g,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS t,
       |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS x
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1, 2),
       |span AS (SELECT g, CAST(max(t) AS BIGINT) AS tmax FROM daily GROUP BY 1),
       |walked AS (
       |  SELECT d.g, t, x, t > tmax - ${YuleWalker.TestDays} AS is_test,
       |    $lagDefs
       |  FROM daily d JOIN span ON d.g = span.g),
       |fit AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_train
       |  FROM walked WHERE NOT is_test GROUP BY 1),
       |naive AS (
       |  SELECT g, CAST(sum(abs(x - l1)) AS HUGEINT) AS snaive,
       |    CAST(count(*) AS BIGINT) AS n_naive
       |  FROM walked WHERE NOT is_test AND l1 IS NOT NULL GROUP BY 1),
       |test_ AS (
       |  SELECT g,
       |    CAST(floor(abs(xhat - CAST(x AS DOUBLE)) * 1e2) AS HUGEINT) AS ae_i,
       |    CAST(floor(2e0 * abs(xhat - CAST(x AS DOUBLE))
       |      / nullif(abs(xhat) + abs(CAST(x AS DOUBLE)), 0e0) * 1e9)
       |      AS HUGEINT) AS sm_i
       |  FROM (
       |    SELECT g, x, $XhatSqlText AS xhat
       |    FROM walked
       |    WHERE is_test AND ${allLagsSql()})),
       |tagg AS (
       |  SELECT g, CAST(sum(ae_i) AS HUGEINT) AS sae,
       |    CAST(sum(sm_i) AS HUGEINT) AS ssm,
       |    CAST(count(*) AS BIGINT) AS n_test
       |  FROM test_ GROUP BY 1)
       |SELECT fit.g AS o_orderpriority, n_train, n_test,
       |  CAST($Alpha AS DOUBLE) AS alpha,
       |  round((CAST(sae AS DOUBLE) / 1e2 / CAST(n_test AS DOUBLE))
       |    / nullif(CAST(snaive AS DOUBLE) / CAST(n_naive AS DOUBLE), 0e0), 4)
       |    + 0.0 AS mase,
       |  round(CAST(ssm AS DOUBLE) / 1e9 / CAST(n_test AS DOUBLE), 4)
       |    + 0.0 AS smape
       |FROM fit JOIN naive ON fit.g = naive.g JOIN tagg ON fit.g = tagg.g""".stripMargin
  }
}
