package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Empirical-Bayes beta-binomial shrinkage (Robbins 1956; the
  * method-of-moments form every "rank the segments honestly" report
  * needs): a 3-sample group at 100% must NOT outrank a 10k-sample
  * group at 80% — the posterior mean (x + α)/(n + α + β) pulls
  * small-n extremes toward the pooled prior exactly as hard as their
  * evidence is thin, and leaves big groups alone. The ranking fix for
  * every per-domain / per-source quality-rate table the curation deck
  * produces (q27 quality rates, q61 lang rates, q109 lift tables all
  * have this small-cell disease).
  *
  * Prior fit (MoM on the group rate distribution): with k group rates
  * pᵢ on the exact MICRO grid (pᵢ = (10⁶x) div n), mean m = P/k and
  * sample variance v = (kΣp² − P²)/(k(k−1)) are exact rationals, and
  * the prior strength M = α+β = (m(1−m) − v)/v CLEARS to the exact
  * integer ratio
  *
  *   M = (P·(10⁶k − P)·(k−1) − k·num) / (k·num),  num = kΣp² − P²
  *
  * (common-denominator algebra in the code) — ONE shared-text double
  * division of DECIMAL(38,0) forms; α = m·M and the posterior chain
  * are shared-text doubles off exact integers. Nothing snaps.
  * Degenerate priors are NULL, not garbage: num = 0 (all rates equal
  * — nothing to fit) and M ≤ 0 (rates MORE dispersed than any
  * binomial mixture allows — a beta prior cannot hold them; the raw
  * rates are the honest report) both nullify eb_rate via CASE.
  *
  * Plan/scale: ONE map-side-combined group aggregate (the corpus
  * touch) → one k-row prior aggregate broadcast back → projection.
  * The prior is dimension-grade by construction. */
object EbShrink {

  /** Shrunk rates over group cells (g, n, x): returns per group
    * (g, n, raw_rate, eb_rate, prior_m, prior_strength). */
  def ebRates(cells: DataFrame): DataFrame = {
    val p = cells
      .selectExpr("g", "n", "x", "(1000000 * x) div n AS p")
      .localCheckpoint(true) // prior fit + posterior projection
    val prior = p.agg(
      expr("CAST(count(1) AS BIGINT)").as("k"),
      expr("CAST(sum(p) AS DECIMAL(38,0))").as("ps"),
      expr("CAST(sum(CAST(p AS DECIMAL(38,0)) * p) AS DECIMAL(38,0))")
        .as("p2"))
      .selectExpr("k", "ps", "k * p2 - ps * ps AS num")
      .selectExpr("k", "ps", "num",
        // M = (P(1e6k − P)(k−1) − k·num) / (k·num), exact forms
        "CASE WHEN num > 0 THEN" +
          " CAST(ps * (1000000 * k - ps) * (k - 1) - k * num AS DOUBLE)" +
          " / CAST(k * num AS DOUBLE) END AS m_strength",
        "CAST(ps AS DOUBLE) / (1000000.0 * CAST(k AS DOUBLE)) AS m_mean")
    p.crossJoin(broadcast(prior))
      .selectExpr("g", "n",
        "round(CAST(p AS DOUBLE) / 1e6, 6) + 0.0 AS raw_rate",
        // posterior mean (x + α)/(n + M), α = m·M; NULL when the
        // prior is degenerate (num = 0) or invalid (M ≤ 0)
        "CASE WHEN m_strength > 0.0 THEN" +
          " round((CAST(x AS DOUBLE) + m_mean * m_strength)" +
          " / (CAST(n AS DOUBLE) + m_strength), 6) + 0.0 END AS eb_rate",
        "round(m_mean, 6) + 0.0 AS prior_m",
        "round(m_strength, 4) + 0.0 AS prior_strength")
  }

  /** q252: per-brand line return rates, shrunk — the honest brand
    * ranking (rare brands' extreme raw rates pulled toward the pooled
    * prior exactly as hard as their n is small). */
  def brandReturnEb(spark: SparkSession, dir: String): DataFrame =
    ebRates(Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_returnflag"))
      .join(broadcast(Tables.part(spark, dir)
        .selectExpr("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("g"))
      .agg(expr("CAST(count(1) AS BIGINT)").as("n"),
        expr("CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)" +
          " AS BIGINT)").as("x")))
      .withColumnRenamed("g", "p_brand")

  /** DuckDB twin: identical cleared-integer prior and posterior
    * text. */
  val brandReturnEbSql: String =
    """WITH cells AS (
      |  SELECT p_brand AS g, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1),
      |p AS (
      |  SELECT g, n, x, (1000000 * x) // n AS p FROM cells),
      |prior AS (
      |  SELECT k, ps, num,
      |    CASE WHEN num > 0 THEN
      |      CAST(ps * (1000000 * k - ps) * (k - 1) - k * num AS DOUBLE)
      |      / CAST(k * num AS DOUBLE) END AS m_strength,
      |    CAST(ps AS DOUBLE) / (1000000.0 * CAST(k AS DOUBLE)) AS m_mean
      |  FROM (
      |    SELECT CAST(count(*) AS BIGINT) AS k,
      |      CAST(sum(p) AS DECIMAL(38,0)) AS ps,
      |      CAST(count(*) AS BIGINT) * CAST(sum(CAST(p AS DECIMAL(38,0)) * p)
      |        AS DECIMAL(38,0))
      |        - CAST(sum(p) AS DECIMAL(38,0)) * CAST(sum(p) AS DECIMAL(38,0))
      |        AS num
      |    FROM p))
      |SELECT g AS p_brand, n,
      |  round(CAST(p AS DOUBLE) / 1e6, 6) + 0.0 AS raw_rate,
      |  CASE WHEN m_strength > 0.0 THEN
      |    round((CAST(x AS DOUBLE) + m_mean * m_strength)
      |    / (CAST(n AS DOUBLE) + m_strength), 6) + 0.0 END AS eb_rate,
      |  round(m_mean, 6) + 0.0 AS prior_m,
      |  round(m_strength, 4) + 0.0 AS prior_strength
      |FROM p CROSS JOIN prior""".stripMargin
}
