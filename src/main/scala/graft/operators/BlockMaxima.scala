package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Gumbel block-maxima return levels — the OTHER extreme-value lens:
  * q188's Hill reads the tail exponent from the upper order
  * statistics; block maxima ask the planning question directly —
  * "what daily revenue peak should we expect once a year? once a
  * decade?" — by fitting a Gumbel law to per-block maxima (the
  * classical EVT limit for light-to-exponential-tailed maxima) via
  * method of moments:
  *
  *   β̂ = s·√6/π,   μ̂ = x̄ − γ·β̂   (γ = Euler–Mascheroni)
  *   z_T = μ̂ − β̂·ln(−ln(1 − 1/T))  (the T-block return level)
  *
  * Exactness: block maxima are exact integer cents (max of exact
  * sums); mean/variance come from the denominator-free integer
  * numerators (n·Q − S², the q183 discipline); β̂/μ̂/z_T are ONE
  * shared-text double chain with literal constants — √6/π and γ are
  * decimal literals identical in both engines, ln(−ln(1−1/T)) is
  * computed with T as a literal (the per-T double is
  * engine-identical because the whole expression text is shared).
  *
  * Plan/scale: one scan → per-(block) daily-sum aggregate → per-block
  * max (both calendar-bounded) → one global aggregate → 1-row
  * finish. */
object BlockMaxima {

  /** Return levels from a block-maxima frame (b, mx): block key and
    * exact BIGINT maximum. `unit` scales display. Returns one row:
    * (n_blocks, mean_max, gumbel_mu, gumbel_beta, rl_12, rl_60,
    * rl_120). */
  def gumbelReturnLevels(maxima: DataFrame, unit: Double): DataFrame = {
    val u = s"CAST($unit AS DOUBLE)"
    maxima.agg(
      expr("CAST(count(1) AS BIGINT)").as("n_blocks"),
      expr("CAST(sum(mx) AS DECIMAL(38,0))").as("s"),
      expr("CAST(sum(CAST(mx AS DECIMAL(38,0)) * mx) AS DECIMAL(38,0))")
        .as("q"))
      .selectExpr("n_blocks",
        s"$MeanSql AS mean_raw", s"$BetaSql AS beta_raw")
      .selectExpr("n_blocks", "mean_raw", "beta_raw",
        s"(mean_raw - $Gamma * beta_raw) AS mu_raw")
      .selectExpr("n_blocks",
        s"round(mean_raw * $u, 4) + 0.0 AS mean_max",
        s"round(mu_raw * $u, 4) + 0.0 AS gumbel_mu",
        s"round(beta_raw * $u, 4) + 0.0 AS gumbel_beta",
        s"round(${rlSql(12)} * $u, 4) + 0.0 AS rl_12",
        s"round(${rlSql(60)} * $u, 4) + 0.0 AS rl_60",
        s"round(${rlSql(120)} * $u, 4) + 0.0 AS rl_120")
  }

  /** Euler–Mascheroni and √6/π as shared decimal literals. */
  private val Gamma = "0.5772156649015329"
  private val Sqrt6OverPi = "0.7796968012336793"

  private val MeanSql =
    "(CASE WHEN n_blocks < 2 THEN NULL" +
      " ELSE CAST(s AS DOUBLE) / CAST(n_blocks AS DOUBLE) END)"
  // s·√6/π with the sample variance from n·Q − S²
  private val BetaSql =
    s"(CASE WHEN n_blocks < 2 THEN NULL ELSE $Sqrt6OverPi" +
      " * sqrt((CAST(n_blocks AS DOUBLE) * CAST(q AS DOUBLE)" +
      " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))" +
      " / (CAST(n_blocks AS DOUBLE)" +
      " * (CAST(n_blocks AS DOUBLE) - 1.0))) END)"

  /** z_T with T as a literal. Two traps live here (both measured at
    * sf0.01): the all-literal `1.0 - 1.0/T` subexpression parses as
    * DECIMAL in Spark (§5 bare-literal rule — hence the e0 notation),
    * and the nested ln(−ln(·)) differs between engines in the last
    * ulp — snapped to the 1e-9 grid. */
  private def rlSql(t: Int) =
    s"(mu_raw - beta_raw * (CAST(floor(ln(-ln(1e0 - 1e0 / ${t}e0))" +
      " * 1e9 + 5e-1) AS BIGINT) / 1e9))"

  /** q199: the once-a-year / 5-year / decade daily-revenue peak, from
    * monthly maxima of exact daily cent totals. */
  def revenueReturnLevels(spark: SparkSession, dir: String): DataFrame =
    gumbelReturnLevels(Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(expr("CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT))" +
        " AS BIGINT)").as("rev"))
      .groupBy(expr("year(day) * 100 + month(day)").as("b"))
      .agg(expr("CAST(max(rev) AS BIGINT)").as("mx")), 0.01)

  /** DuckDB twin: identical maxima, numerators, literal constants. */
  val revenueReturnLevelsSql: String = {
    val u = "CAST(0.01 AS DOUBLE)"
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT)
       |      AS rev
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1),
       |maxima AS (
       |  SELECT year(day) * 100 + month(day) AS b,
       |    CAST(max(rev) AS BIGINT) AS mx
       |  FROM daily GROUP BY 1),
       |sums AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_blocks,
       |    CAST(sum(mx) AS HUGEINT) AS s,
       |    CAST(sum(CAST(mx AS HUGEINT) * mx) AS HUGEINT) AS q
       |  FROM maxima),
       |shaped AS (
       |  SELECT n_blocks, $MeanSql AS mean_raw, $BetaSql AS beta_raw
       |  FROM sums),
       |located AS (
       |  SELECT n_blocks, mean_raw, beta_raw,
       |    (mean_raw - $Gamma * beta_raw) AS mu_raw
       |  FROM shaped)
       |SELECT n_blocks,
       |  round(mean_raw * $u, 4) + 0.0 AS mean_max,
       |  round(mu_raw * $u, 4) + 0.0 AS gumbel_mu,
       |  round(beta_raw * $u, 4) + 0.0 AS gumbel_beta,
       |  round(${rlSql(12)} * $u, 4) + 0.0 AS rl_12,
       |  round(${rlSql(60)} * $u, 4) + 0.0 AS rl_60,
       |  round(${rlSql(120)} * $u, 4) + 0.0 AS rl_120
       |FROM located""".stripMargin
  }
}
