package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Forecast-baseline backtest — scores the two standard no-model
  * forecasts on a regularly-sampled series: seasonal-naive
  * (x̂ₜ = xₜ₋₇, "same weekday last week") and naive (x̂ₜ = xₜ₋₁),
  * reporting MAE / bias / MAPE / RMSE and the MASE ratio
  * (seasonal-naive MAE over naive MAE — < 1 means the weekly pattern
  * genuinely forecasts). Any real forecasting effort must beat this
  * row; publishing it beside q111's ACF closes the time-series
  * diagnostic loop.
  *
  * Exactness: errors are exact integer cents; |e| and e² sum as
  * BIGINT/decimal; each MAPE term is the exact integer division
  * (|e|·1e6) div x (x > 0 guarded), summed as integers — no
  * per-term doubles anywhere. Display divisions are one shared-text
  * step each; RMSE's sqrt is IEEE-correctly-rounded, so both engines
  * agree bit-for-bit. MASE compares cross-multiplied exact integer
  * products, not two rounded quotients.
  *
  * Plan/scale: fact scan → calendar-day cells first (the q111
  * discipline — the one global ordered window runs over
  * dimension-grade cells), both lags from ONE window spec, then a
  * single 1-row aggregate. */
object Backtest {

  /** Backtest row over a cell series (tCol orderable bucket, xCol
    * exact positive BIGINT cents). Seasonal period = `season`. */
  def naiveBacktest(series: DataFrame, tCol: String, xCol: String,
      season: Int): DataFrame = {
    val w = Window.orderBy("t")
    series
      .select(col(tCol).as("t"), col(xCol).as("x"))
      .withColumn("ps", lag(col("x"), season).over(w))
      .withColumn("pn", lag(col("x"), 1).over(w))
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_days"),
        expr("CAST(count(ps) AS BIGINT)").as("n_s"),
        expr("CAST(count(pn) AS BIGINT)").as("n_n"),
        expr("CAST(sum(abs(x - ps)) AS BIGINT)").as("sae_s"),
        expr("CAST(sum(abs(x - pn)) AS BIGINT)").as("sae_n"),
        expr("CAST(sum(x - ps) AS BIGINT)").as("se_s"),
        expr("CAST(sum(CASE WHEN x > 0 THEN (abs(x - ps) * 1000000) div x" +
          " END) AS BIGINT)").as("sppm_s"),
        expr("CAST(sum(CAST(x - ps AS DECIMAL(38,0)) * (x - ps))" +
          " AS DECIMAL(38,0))").as("sse_s"))
      .selectExpr("n_days", "n_s AS n_scored",
        "round(CAST(sae_s AS DOUBLE) / nullif(CAST(n_s AS DOUBLE), 0e0)" +
          " / 1e2, 2) + 0.0 AS mae",
        "round(CAST(se_s AS DOUBLE) / nullif(CAST(n_s AS DOUBLE), 0e0)" +
          " / 1e2, 2) + 0.0 AS bias",
        "round(CAST(sppm_s AS DOUBLE) / nullif(CAST(n_s AS DOUBLE), 0e0)" +
          " / 1e4, 4) + 0.0 AS mape_pct",
        "round(sqrt(CAST(sse_s AS DOUBLE) / nullif(CAST(n_s AS DOUBLE)," +
          " 0e0)) / 1e2, 2) + 0.0 AS rmse",
        "round(CAST(CAST(sae_s AS DECIMAL(38,0)) * n_n AS DOUBLE)" +
          " / nullif(CAST(CAST(sae_n AS DECIMAL(38,0)) * n_s AS DOUBLE)," +
          " 0e0), 6) + 0.0 AS mase")
  }

  /** q115: how forecastable is daily order revenue from last week's
    * value alone? */
  def dailyRevenueBacktest(spark: SparkSession, dir: String): DataFrame =
    naiveBacktest(
      Tables.orders(spark, dir)
        .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
        .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(expr("CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT))" +
          " AS BIGINT)").as("rev")),
      "day", "rev", 7)

  val dailyRevenueBacktestSql: String =
    """WITH days AS (
      |  SELECT CAST(o_orderdate AS DATE) AS t,
      |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS x
      |  FROM orders
      |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
      |  GROUP BY 1),
      |lagged AS (
      |  SELECT x, lag(x, 7) OVER (ORDER BY t) AS ps,
      |    lag(x, 1) OVER (ORDER BY t) AS pn
      |  FROM days),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(count(ps) AS BIGINT) AS n_s,
      |    CAST(count(pn) AS BIGINT) AS n_n,
      |    CAST(sum(abs(x - ps)) AS BIGINT) AS sae_s,
      |    CAST(sum(abs(x - pn)) AS BIGINT) AS sae_n,
      |    CAST(sum(x - ps) AS BIGINT) AS se_s,
      |    CAST(sum(CASE WHEN x > 0 THEN (abs(x - ps) * 1000000) // x
      |      END) AS BIGINT) AS sppm_s,
      |    CAST(sum(CAST(x - ps AS HUGEINT) * (x - ps)) AS DECIMAL(38,0)) AS sse_s
      |  FROM lagged)
      |SELECT n_days, n_s AS n_scored,
      |  round(CAST(sae_s AS DOUBLE) / nullif(CAST(n_s AS DOUBLE), 0e0)
      |    / 1e2, 2) + 0.0 AS mae,
      |  round(CAST(se_s AS DOUBLE) / nullif(CAST(n_s AS DOUBLE), 0e0)
      |    / 1e2, 2) + 0.0 AS bias,
      |  round(CAST(sppm_s AS DOUBLE) / nullif(CAST(n_s AS DOUBLE), 0e0)
      |    / 1e4, 4) + 0.0 AS mape_pct,
      |  round(sqrt(CAST(sse_s AS DOUBLE) / nullif(CAST(n_s AS DOUBLE),
      |    0e0)) / 1e2, 2) + 0.0 AS rmse,
      |  round(CAST(CAST(sae_s AS HUGEINT) * n_n AS DOUBLE)
      |    / nullif(CAST(CAST(sae_n AS HUGEINT) * n_s AS DOUBLE),
      |    0e0), 6) + 0.0 AS mase
      |FROM agg""".stripMargin
}
