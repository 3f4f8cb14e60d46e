package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ljung–Box portmanteau test — "is this series WHITE NOISE?" q111
  * draws the ACF; this is the inference on top of it: LB =
  * n(n+2)·Σ_{k≤h} ρ²_k/(n−k) ~ χ²_h under independence, the standard
  * residual-whiteness / is-there-anything-left-to-model readout (the
  * q159-to-q110 move applied to the autocorrelation deck). A lone
  * ρ_3 = 0.2 eyeballed off q111 is easy to over-read; LB prices all h
  * lags jointly.
  *
  * Exactness: consumes q111's ROUND-6 snapped ρ (already bit-equal
  * cross-engine), lifted back to exact integer micro-units — so the
  * lag sum is integer arithmetic: term_k = (ρm²·10³) div (n−k),
  * summed as BIGINTs (order-free), and LB = n(n+2)·Σ/10¹⁵ is ONE
  * shared-text double, round-4 snapped. The χ²_h tail comes via the
  * Wilson–Hilferty cube-root normalization
  * z = ((LB/h)^⅓ − (1 − 2/9h))/√(2/9h) — the cube root is a libm pow,
  * so its output is snapped to the 1e-9 grid (house libm rule) before
  * the rational z chain; z round-4, then the one-sided upper tail via
  * the A&S erfc chain (q100 convention), round-6. |W–H error| ≲ 1e-3
  * in p for h = 7 — inferential-grade and identical in both engines,
  * which is the contract.
  *
  * Plan/scale: everything after q111's one keyed aggregate + one
  * calendar-cell window is arithmetic on an h-row frame → one 1-row
  * aggregate. */
object LjungBox {

  /** Ljung–Box over an ACF frame (lag, n_buckets, n_pairs, acf) as
    * produced by [[Autocorr.acf]]. NULL-acf lags (degenerate series)
    * are excluded and do not count toward h. Returns one row:
    * (n_buckets, h_lags, lb_stat, z_wh, p_value). */
  def ljungBox(acfFrame: DataFrame): DataFrame =
    acfFrame
      .filter(col("acf").isNotNull && col("n_pairs") > 0L)
      .selectExpr("n_buckets", "n_pairs",
        "CAST(round(acf * 1000000) AS BIGINT) AS rm")
      .agg(
        expr("CAST(max(n_buckets) AS BIGINT)").as("n"),
        expr("CAST(count(1) AS BIGINT)").as("h_lags"),
        expr("CAST(sum((rm * rm * 1000) div n_pairs) AS BIGINT)").as("ssum"))
      .selectExpr("n AS n_buckets", "h_lags",
        s"round($LbSql, 4) + 0.0 AS lb_stat")
      .selectExpr("n_buckets", "h_lags", "lb_stat",
        s"round($ZSql, 4) + 0.0 AS z_wh")
      .selectExpr("n_buckets", "h_lags", "lb_stat", "z_wh",
        s"round(${pUpperSql("z_wh")}, 6) + 0.0 AS p_value")

  /** Shared-text LB = n(n+2)·Σterms/10¹⁵. */
  private val LbSql =
    "CAST(n * (n + 2) AS DOUBLE) * CAST(ssum AS DOUBLE) / 1e15"

  /** Wilson–Hilferty z from the round-4 LB: cube root snapped to the
    * 1e-9 grid, then a rational chain (sqrt is IEEE-exact). */
  private val ZSql = {
    val cb = "(CAST(floor(pow(lb_stat / CAST(h_lags AS DOUBLE)," +
      " 0.3333333333333333) * 1e9 + 0.5) AS DOUBLE) / 1e9)"
    val mu = "(1.0 - 2.0 / (9.0 * CAST(h_lags AS DOUBLE)))"
    val sd = "sqrt(2.0 / (9.0 * CAST(h_lags AS DOUBLE)))"
    s"($cb - $mu) / $sd"
  }

  /** One-sided upper-tail normal p via the A&S 7.1.26 erfc chain:
    * P(Z > z) = erfc(z/√2)/2 for z ≥ 0, 1 − erfc(−z/√2)/2 below. */
  private def pUpperSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val poly = s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
    s"(CASE WHEN $z >= 0.0 THEN $poly / 2.0 ELSE 1.0 - $poly / 2.0 END)"
  }

  /** q173: is daily order revenue white noise across lags 1–7? The
    * joint test over q111's exact ACF. */
  def dailyRevenueLjungBox(spark: SparkSession, dir: String): DataFrame =
    ljungBox(Autocorr.dailyRevenueAcf(spark, dir))

  /** DuckDB twin: q111's ACF chain verbatim, then the identical
    * integer lag sum and W–H/erfc chain. */
  val dailyRevenueLjungBoxSql: String =
    s"""WITH acf_ AS (
       |${Autocorr.dailyRevenueAcfSql.linesIterator.map("  " + _).mkString("\n")}
       |),
       |lifted AS (
       |  SELECT n_buckets, n_pairs,
       |    CAST(round(acf * 1000000) AS BIGINT) AS rm
       |  FROM acf_ WHERE acf IS NOT NULL AND n_pairs > 0),
       |agg AS (
       |  SELECT CAST(max(n_buckets) AS BIGINT) AS n,
       |    CAST(count(*) AS BIGINT) AS h_lags,
       |    CAST(sum((rm * rm * 1000) // n_pairs) AS BIGINT) AS ssum
       |  FROM lifted),
       |lb AS (
       |  SELECT n AS n_buckets, h_lags,
       |    round($LbSql, 4) + 0.0 AS lb_stat
       |  FROM agg),
       |z AS (
       |  SELECT n_buckets, h_lags, lb_stat,
       |    round($ZSql, 4) + 0.0 AS z_wh
       |  FROM lb)
       |SELECT n_buckets, h_lags, lb_stat, z_wh,
       |  round(${pUpperSql("z_wh")}, 6) + 0.0 AS p_value
       |FROM z""".stripMargin
}
