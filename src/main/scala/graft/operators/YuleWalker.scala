package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Yule–Walker AR(2) fit — the MODEL rung of the time-series deck:
  * q111 reads raw autocorrelation, q209/q210 diagnose the residual
  * and unit-root questions; Yule–Walker turns the same sufficient
  * statistics into the actual forecasting model "xₜ = φ₁xₜ₋₁ + φ₂xₜ₋₂
  * + ε" — and φ₂ IS the lag-2 partial autocorrelation (PACF(2)), the
  * standard "is AR(1) enough?" order-selection read: φ₂ ≈ 0 says lag
  * 2 adds nothing once lag 1 is in.
  *
  *   φ₂ = (ρ₂ − ρ₁²)/(1 − ρ₁²)      φ₁ = ρ₁(1 − ρ₂)/(1 − ρ₁²)
  *   σ²/γ₀ = 1 − φ₁ρ₁ − φ₂ρ₂        (innovation-variance ratio)
  *
  * Exactness: clearing the mean (e'ₜ = n·xₜ − S) makes the biased-
  * divisor autocovariance sums exact integers — C_k = Σ_{t>k} e'ₜe'ₜ₋ₖ
  * as DECIMAL(38,0) (the 1/n·n² divisors cancel in every ratio), so
  *
  *   ρ₁ = C₁/C₀   ρ₂ = C₂/C₀
  *   φ₂ = (C₂C₀ − C₁²)/(C₀² − C₁²)   φ₁ = C₁(C₀ − C₂)/(C₀² − C₁²)
  *
  * are shared-text chains on exactly-recovered doubles (the q134
  * correctly-rounded-cast rule; the numerator/denominator PRODUCTS run
  * in double — deterministic IEEE on bit-identical operands). The
  * biased (divisor-n) estimator is the standard YW choice: it keeps
  * the implied model stationary. Constant series (C₀ = 0) and
  * |ρ₁| = 1 (singular Toeplitz) → NULL; dollar-unit day cells keep
  * C₀ ≲ 10²³ ≪ 10³⁸.
  *
  * Plan/scale: one corpus-touch daily aggregate → group-grade (n, S)
  * broadcast back → ONE ordered window pass per group (2 lags — the
  * q115 calendar class) → one keyed aggregate → 1-row-per-group
  * finish. */
object YuleWalker {

  private val DetSql = "(c0d * c0d - c1d * c1d)"
  private val GuardSql =
    s"(n_buckets >= 4 AND c0d > 0e0 AND abs($DetSql) > 0e0)"
  private val Phi1Sql = s"(c1d * (c0d - c2d) / $DetSql)"
  private val Phi2Sql = s"((c2d * c0d - c1d * c1d) / $DetSql)"
  private val Rho1Sql = "(c1d / c0d)"
  private val Rho2Sql = "(c2d / c0d)"

  /** AR(2) Yule–Walker fit per group from (g, t, x): group key,
    * orderable bucket, exact BIGINT value. One row per group:
    * (g, n_buckets, rho1, rho2, phi1, phi2, sigma_ratio). */
  def ar2(series: DataFrame): DataFrame = {
    val pts = series.select("g", "t", "x").localCheckpoint(true)
    val fit = pts.groupBy("g").agg(
      expr("CAST(count(1) AS BIGINT)").as("n_rows"),
      expr("CAST(sum(x) AS DECIMAL(38,0))").as("s_i"))
    val w = Window.partitionBy("g").orderBy("t")
    pts.join(broadcast(fit), "g")
      .withColumn("e", expr("CAST(n_rows AS DECIMAL(38,0)) * x - s_i"))
      .withColumn("e1", lag("e", 1).over(w))
      .withColumn("e2", lag("e", 2).over(w))
      .groupBy("g")
      .agg(
        expr("CAST(max(n_rows) AS BIGINT)").as("n_buckets"),
        expr("CAST(sum(e * e) AS DECIMAL(38,0))").as("c0"),
        expr("CAST(sum(e * e1) AS DECIMAL(38,0))").as("c1"),
        expr("CAST(sum(e * e2) AS DECIMAL(38,0))").as("c2"))
      .selectExpr("g", "n_buckets", "CAST(c0 AS DOUBLE) AS c0d",
        "CAST(c1 AS DOUBLE) AS c1d", "CAST(c2 AS DOUBLE) AS c2d")
      .selectExpr("g", "n_buckets",
        s"CASE WHEN $GuardSql THEN round($Rho1Sql, 6) + 0.0 END AS rho1",
        s"CASE WHEN $GuardSql THEN round($Rho2Sql, 6) + 0.0 END AS rho2",
        s"CASE WHEN $GuardSql THEN round($Phi1Sql, 6) + 0.0 END AS phi1",
        s"CASE WHEN $GuardSql THEN round($Phi2Sql, 6) + 0.0 END AS phi2",
        s"CASE WHEN $GuardSql THEN round(1e0 - $Phi1Sql * $Rho1Sql" +
          s" - $Phi2Sql * $Rho2Sql, 6) + 0.0 END AS sigma_ratio")
  }

  /** q217: the AR(2) forecast model of daily order revenue per
    * priority — φ₂ is the PACF(2) order-selection read on the q111
    * ACF's own series (dollar units, the q216 bound note). */
  def dailyRevenueAr2(spark: SparkSession, dir: String): DataFrame =
    ar2(Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS t",
        "CAST(floor(o_totalprice) AS BIGINT) AS usd")
      .groupBy("g", "t")
      .agg(expr("CAST(sum(usd) AS BIGINT)").as("x")))
      .withColumnRenamed("g", "o_orderpriority")

  // ------------- q272: AR(2) one-step backtest (MASE / sMAPE) -------------

  /** Holdout horizon (calendar days per group). */
  val TestDays = 28

  private val MuSql = "(s_d / CAST(n_buckets AS DOUBLE))"
  private def xhatSql: String =
    s"($MuSql + $Phi1Sql * (CAST(x1 AS DOUBLE) - $MuSql)" +
      s" + $Phi2Sql * (CAST(x2 AS DOUBLE) - $MuSql))"

  /** q272: does q217's AR(2) actually FORECAST? — the missing rung
    * above the fit: hold out the last [[TestDays]] calendar days per
    * group, fit Yule–Walker on the train prefix ONLY, roll one-step
    * forecasts across the holdout (x̂ₜ = μ + φ₁(xₜ₋₁−μ) + φ₂(xₜ₋₂−μ),
    * actual lagged values — the standard one-step backtest), and
    * report the two standard scale-free accuracy metrics:
    *
    *   MASE  = mean|x̂−x|_test / mean|xₜ−xₜ₋₁|_train   (< 1 beats the
    *           naive random walk — Hyndman & Koehler 2006)
    *   sMAPE = mean( 2|x̂−x| / (|x̂|+|x|) )_test
    *
    * Exactness: the fit is q217's cleared-integer program on the
    * train rows verbatim; μ and each forecast are one shared-text
    * chain off the exactly-recovered (s, n, C₀, C₁, C₂); per-row
    * |error| terms are 1e-2-floored integers summed DECIMAL (cent
    * grid — errors are dollar-scale, the q209 micro-sum move at the
    * scale the data needs, sMAPE terms ≤ 2 on the 1e-9 grid); the
    * naive denominator is EXACT (integer |xₜ−xₜ₋₁|). Degenerate fits
    * (the q217 guard) NULL the metrics; the lag window runs over the
    * FULL series so the first test days correctly borrow the last
    * train days as lags.
    *
    * Plan/scale: the q209/q217 day-cell class — one corpus-touch daily
    * aggregate, a group-grade max(t) broadcast, ONE ordered window
    * pass, two keyed aggregates. */
  def arBacktest(series: DataFrame): DataFrame = {
    val daily = series.select("g", "t", "x").localCheckpoint(true)
    val span = daily.groupBy("g")
      .agg(expr("CAST(max(t) AS BIGINT)").as("tmax"))
    val w = Window.partitionBy("g").orderBy("t")
    val walked = daily.join(broadcast(span), "g")
      .withColumn("x1", lag("x", 1).over(w))
      .withColumn("x2", lag("x", 2).over(w))
      .withColumn("is_test", expr(s"t > tmax - $TestDays"))
      .localCheckpoint(true) // fit + naive + forecast all read it
    val fit = walked.filter(!col("is_test"))
      .groupBy("g").agg(
        expr("CAST(count(1) AS BIGINT)").as("n_rows"),
        expr("CAST(sum(x) AS DECIMAL(38,0))").as("s_i"))
    val cs = walked.filter(!col("is_test"))
      .join(broadcast(fit), "g")
      .withColumn("e", expr("CAST(n_rows AS DECIMAL(38,0)) * x - s_i"))
      .withColumn("e1", lag("e", 1).over(w))
      .withColumn("e2", lag("e", 2).over(w))
      .groupBy("g").agg(
        expr("CAST(max(n_rows) AS BIGINT)").as("n_buckets"),
        expr("CAST(max(CAST(s_i AS DOUBLE)) AS DOUBLE)").as("s_d"),
        expr("CAST(sum(e * e) AS DECIMAL(38,0))").as("c0"),
        expr("CAST(sum(e * e1) AS DECIMAL(38,0))").as("c1"),
        expr("CAST(sum(e * e2) AS DECIMAL(38,0))").as("c2"))
      .selectExpr("g", "n_buckets", "s_d", "CAST(c0 AS DOUBLE) AS c0d",
        "CAST(c1 AS DOUBLE) AS c1d", "CAST(c2 AS DOUBLE) AS c2d")
    val naive = walked.filter(!col("is_test") && col("x1").isNotNull)
      .groupBy("g").agg(
        expr("CAST(sum(abs(x - x1)) AS DECIMAL(38,0))").as("snaive"),
        expr("CAST(count(1) AS BIGINT)").as("n_naive"))
    val test = walked
      .filter(col("is_test") && col("x1").isNotNull && col("x2").isNotNull)
      .join(broadcast(cs), "g")
      .selectExpr("g", "x", s"CASE WHEN $GuardSql THEN $xhatSql END AS xhat")
      .selectExpr("g",
        "CAST(floor(abs(xhat - CAST(x AS DOUBLE)) * 1e2) AS DECIMAL(38,0)) AS ae_i",
        "CAST(floor(2e0 * abs(xhat - CAST(x AS DOUBLE))" +
          " / nullif(abs(xhat) + abs(CAST(x AS DOUBLE)), 0e0) * 1e9) AS DECIMAL(38,0)) AS sm_i")
      .groupBy("g").agg(
        expr("CAST(sum(ae_i) AS DECIMAL(38,0))").as("sae"),
        expr("CAST(sum(sm_i) AS DECIMAL(38,0))").as("ssm"),
        expr("CAST(count(1) AS BIGINT)").as("n_test"))
    cs.join(naive, "g").join(test, "g")
      .selectExpr("g", "n_buckets AS n_train", "n_test",
        s"CASE WHEN $GuardSql THEN round($Phi1Sql, 6) + 0.0 END AS phi1",
        s"CASE WHEN $GuardSql THEN round($Phi2Sql, 6) + 0.0 END AS phi2",
        "round((CAST(sae AS DOUBLE) / 1e2 / CAST(n_test AS DOUBLE))" +
          " / nullif(CAST(snaive AS DOUBLE) / CAST(n_naive AS DOUBLE), 0e0), 4)" +
          " + 0.0 AS mase",
        "round(CAST(ssm AS DOUBLE) / 1e9 / CAST(n_test AS DOUBLE), 4)" +
          " + 0.0 AS smape")
  }

  /** q272: the AR(2) backtest on q217's own daily-revenue series. */
  def dailyRevenueArBacktest(spark: SparkSession, dir: String): DataFrame =
    arBacktest(Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS t",
        "CAST(floor(o_totalprice) AS BIGINT) AS usd")
      .groupBy("g", "t")
      .agg(expr("CAST(sum(usd) AS BIGINT)").as("x")))
      .withColumnRenamed("g", "o_orderpriority")

  /** DuckDB twin: identical split, cleared-integer train fit, shared
    * forecast chain, micro-summed metrics. */
  val dailyRevenueArBacktestSql: String =
    s"""WITH daily AS (
       |  SELECT o_orderpriority AS g,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS t,
       |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS x
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1, 2),
       |span AS (SELECT g, CAST(max(t) AS BIGINT) AS tmax FROM daily GROUP BY 1),
       |walked AS (
       |  SELECT d.g, t, x,
       |    lag(x, 1) OVER (PARTITION BY d.g ORDER BY t) AS x1,
       |    lag(x, 2) OVER (PARTITION BY d.g ORDER BY t) AS x2,
       |    t > tmax - $TestDays AS is_test
       |  FROM daily d JOIN span ON d.g = span.g),
       |fit AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS s_i
       |  FROM walked WHERE NOT is_test GROUP BY 1),
       |cleared AS (
       |  SELECT w.g, n_rows, CAST(s_i AS DOUBLE) AS s_dd,
       |    CAST(n_rows AS HUGEINT) * x - s_i AS e,
       |    lag(CAST(n_rows AS HUGEINT) * x - s_i, 1)
       |      OVER (PARTITION BY w.g ORDER BY t) AS e1,
       |    lag(CAST(n_rows AS HUGEINT) * x - s_i, 2)
       |      OVER (PARTITION BY w.g ORDER BY t) AS e2
       |  FROM walked w JOIN fit ON w.g = fit.g
       |  WHERE NOT is_test),
       |cs AS (
       |  SELECT g, CAST(max(n_rows) AS BIGINT) AS n_buckets,
       |    CAST(max(s_dd) AS DOUBLE) AS s_d,
       |    CAST(CAST(sum(e * e) AS HUGEINT) AS DOUBLE) AS c0d,
       |    CAST(CAST(sum(e * e1) AS HUGEINT) AS DOUBLE) AS c1d,
       |    CAST(CAST(sum(e * e2) AS HUGEINT) AS DOUBLE) AS c2d
       |  FROM cleared GROUP BY 1),
       |naive AS (
       |  SELECT g, CAST(sum(abs(x - x1)) AS HUGEINT) AS snaive,
       |    CAST(count(*) AS BIGINT) AS n_naive
       |  FROM walked WHERE NOT is_test AND x1 IS NOT NULL GROUP BY 1),
       |test_ AS (
       |  SELECT w.g,
       |    CAST(floor(abs(xhat - CAST(x AS DOUBLE)) * 1e2) AS HUGEINT) AS ae_i,
       |    CAST(floor(2e0 * abs(xhat - CAST(x AS DOUBLE))
       |      / nullif(abs(xhat) + abs(CAST(x AS DOUBLE)), 0e0) * 1e9) AS HUGEINT) AS sm_i
       |  FROM (
       |    SELECT w0.g, x,
       |      CASE WHEN $GuardSql THEN $xhatSql END AS xhat
       |    FROM walked w0 JOIN cs ON w0.g = cs.g
       |    WHERE is_test AND x1 IS NOT NULL AND x2 IS NOT NULL) w),
       |tagg AS (
       |  SELECT g, CAST(sum(ae_i) AS HUGEINT) AS sae,
       |    CAST(sum(sm_i) AS HUGEINT) AS ssm,
       |    CAST(count(*) AS BIGINT) AS n_test
       |  FROM test_ GROUP BY 1)
       |SELECT cs.g AS o_orderpriority, n_buckets AS n_train, n_test,
       |  CASE WHEN $GuardSql THEN round($Phi1Sql, 6) + 0.0 END AS phi1,
       |  CASE WHEN $GuardSql THEN round($Phi2Sql, 6) + 0.0 END AS phi2,
       |  round((CAST(sae AS DOUBLE) / 1e2 / CAST(n_test AS DOUBLE))
       |    / nullif(CAST(snaive AS DOUBLE) / CAST(n_naive AS DOUBLE), 0e0), 4)
       |    + 0.0 AS mase,
       |  round(CAST(ssm AS DOUBLE) / 1e9 / CAST(n_test AS DOUBLE), 4)
       |    + 0.0 AS smape
       |FROM cs JOIN naive ON cs.g = naive.g JOIN tagg ON cs.g = tagg.g""".stripMargin

  /** DuckDB twin: identical cleared integers and shared chains. */
  val dailyRevenueAr2Sql: String =
    s"""WITH daily AS (
       |  SELECT o_orderpriority AS g,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS t,
       |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS x
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1, 2),
       |fit AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS s_i
       |  FROM daily GROUP BY 1),
       |walked AS (
       |  SELECT d.g, n_rows,
       |    CAST(n_rows AS HUGEINT) * x - s_i AS e,
       |    lag(CAST(n_rows AS HUGEINT) * x - s_i, 1)
       |      OVER (PARTITION BY d.g ORDER BY t) AS e1,
       |    lag(CAST(n_rows AS HUGEINT) * x - s_i, 2)
       |      OVER (PARTITION BY d.g ORDER BY t) AS e2
       |  FROM daily d JOIN fit ON d.g = fit.g),
       |agg AS (
       |  SELECT g,
       |    CAST(max(n_rows) AS BIGINT) AS n_buckets,
       |    CAST(sum(e * e) AS HUGEINT) AS c0,
       |    CAST(sum(e * e1) AS HUGEINT) AS c1,
       |    CAST(sum(e * e2) AS HUGEINT) AS c2
       |  FROM walked GROUP BY 1),
       |rec AS (
       |  SELECT g, n_buckets, CAST(c0 AS DOUBLE) AS c0d,
       |    CAST(c1 AS DOUBLE) AS c1d, CAST(c2 AS DOUBLE) AS c2d
       |  FROM agg)
       |SELECT g AS o_orderpriority, n_buckets,
       |  CASE WHEN $GuardSql THEN round($Rho1Sql, 6) + 0.0 END AS rho1,
       |  CASE WHEN $GuardSql THEN round($Rho2Sql, 6) + 0.0 END AS rho2,
       |  CASE WHEN $GuardSql THEN round($Phi1Sql, 6) + 0.0 END AS phi1,
       |  CASE WHEN $GuardSql THEN round($Phi2Sql, 6) + 0.0 END AS phi2,
       |  CASE WHEN $GuardSql THEN round(1e0 - $Phi1Sql * $Rho1Sql
       |    - $Phi2Sql * $Rho2Sql, 6) + 0.0 END AS sigma_ratio
       |FROM rec""".stripMargin
}
