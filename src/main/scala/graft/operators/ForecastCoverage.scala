package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Forecast-interval coverage audit — the CALIBRATION check on the
  * forecasting deck (the q234/q241 honest-audit doctrine applied to
  * prediction intervals). q272/q289 score point forecasts (MASE);
  * anyone ACTING on a forecast acts on its interval, and a ±1.96σ
  * band whose empirical holdout coverage is 80% is a risk model that
  * lies. This audit fits the q289 truncated-SES predictor, estimates
  * σ from the TRAIN one-step errors, and reports what fraction of
  * HOLDOUT actuals the nominal 95% band actually contains.
  *
  * Exactness: the q289 split/lag/predictor machinery verbatim; train
  * error squares are 1e-4-floored DECIMAL(38,0) sums (order-free), σ
  * is ONE shared chain, and each coverage verdict compares round-4
  * snapped |error| against the round-4 snapped band half-width — an
  * equality-stable comparison in both engines.
  *
  * Plan/scale: the q272/q289 day-cell class — one scan, one lag
  * window pass, three keyed aggregates. */
object ForecastCoverage {

  private val Lags = 20 // q289's bank, reused verbatim via Ses

  /** q310: per priority — (o_orderpriority, n_train_err, sigma,
    * n_test, n_covered, coverage_ppm): nominal 95% SES band vs
    * holdout reality. */
  def dailyRevenueCoverage(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS t",
        "CAST(floor(o_totalprice) AS BIGINT) AS usd")
      .groupBy("g", "t")
      .agg(expr("CAST(sum(usd) AS BIGINT)").as("x"))
      .localCheckpoint(true)
    val span = daily.groupBy("g")
      .agg(expr("CAST(max(t) AS BIGINT)").as("tmax"))
    val w = Window.partitionBy("g").orderBy("t")
    val walked = (1 to Lags).foldLeft(
      daily.join(broadcast(span), "g")
        .withColumn("is_test", expr(s"t > tmax - ${YuleWalker.TestDays}"))) {
      case (df, j) => df.withColumn(s"l$j", lag("x", j).over(w))
    }
      .filter((1 to Lags).map(j => col(s"l$j").isNotNull).reduce(_ && _))
      .selectExpr("g", "is_test", "x", s"${Ses.XhatSqlText} AS xhat")
      .withColumn("abs_e", expr("abs(CAST(x AS DOUBLE) - xhat)"))
      .localCheckpoint(true) // sigma pass + coverage pass
    val sigma = walked.filter(!col("is_test"))
      .groupBy("g")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_train_err"),
        expr("CAST(sum(CAST(floor(abs_e * abs_e * 1e4) AS DECIMAL(38,0)))" +
          " AS DECIMAL(38,0))").as("ss_i"))
      .selectExpr("g", "n_train_err",
        "sqrt(CAST(ss_i AS DOUBLE) / 1e4 / CAST(n_train_err AS DOUBLE))" +
          " AS sigma_raw")
    walked.filter(col("is_test"))
      .join(broadcast(sigma), "g")
      .groupBy("g", "n_train_err", "sigma_raw")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_test"),
        expr("CAST(sum(CAST(round(abs_e, 4) <= round(1.96 * sigma_raw, 4)" +
          " AS BIGINT)) AS BIGINT)").as("n_covered"))
      .selectExpr("g AS o_orderpriority", "n_train_err",
        "round(sigma_raw, 4) + 0.0 AS sigma", "n_test", "n_covered",
        "n_covered * 1000000 div n_test AS coverage_ppm")
  }

  /** DuckDB twin: identical split, predictor, floored SS, snapped
    * band comparison. */
  val dailyRevenueCoverageSql: String = {
    val lagDefs = (1 to Lags).map(j =>
      s"lag(x, $j) OVER (PARTITION BY d.g ORDER BY t) AS l$j")
      .mkString(",\n       |    ")
    val allLags = (1 to Lags).map(j => s"l$j IS NOT NULL")
      .mkString(" AND ")
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
       |scored AS (
       |  SELECT g, is_test, x, xhat,
       |    abs(CAST(x AS DOUBLE) - xhat) AS abs_e
       |  FROM (
       |    SELECT g, is_test, x, ${Ses.XhatSqlText} AS xhat
       |    FROM walked WHERE $allLags)),
       |sig AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_train_err,
       |    sqrt(CAST(CAST(sum(CAST(floor(abs_e * abs_e * 1e4) AS HUGEINT))
       |      AS HUGEINT) AS DOUBLE) / 1e4 / CAST(count(*) AS DOUBLE))
       |      AS sigma_raw
       |  FROM scored WHERE NOT is_test GROUP BY 1)
       |SELECT s.g AS o_orderpriority, n_train_err,
       |  round(sigma_raw, 4) + 0.0 AS sigma,
       |  CAST(count(*) AS BIGINT) AS n_test,
       |  CAST(sum(CAST(round(abs_e, 4) <= round(1.96 * sigma_raw, 4)
       |    AS BIGINT)) AS BIGINT) AS n_covered,
       |  CAST(sum(CAST(round(abs_e, 4) <= round(1.96 * sigma_raw, 4)
       |    AS BIGINT)) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
       |    AS coverage_ppm
       |FROM scored s JOIN sig ON s.g = sig.g
       |WHERE is_test
       |GROUP BY 1, 2, sigma_raw""".stripMargin
  }
}
