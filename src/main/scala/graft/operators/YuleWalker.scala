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
