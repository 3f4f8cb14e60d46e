package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Negative-binomial method-of-moments fit — the MODEL rung on top of
  * q189's verdict: the dispersion test says daily arrivals clump; a
  * capacity plan, anomaly threshold, or synthetic-load generator then
  * needs the DISTRIBUTION, and fitting Poisson to overdispersed
  * counts understates every tail quantile. MoM on the same dense
  * cells: size r = m²/(s² − m), prob p = m/s² (the R `dnbinom(size,
  * prob)` convention: mean = r(1−p)/p = m, variance = m + m²/r = s²
  * — moments matched by construction).
  *
  * EXACTNESS: both parameters CLEAR to exact integer ratios over the
  * cell sufficient statistics S = Σc, Q = Σc², n periods:
  *
  *   p = S(n−1) / (nQ − S²),   r = S²(n−1) / (n(nQ − S² − (n−1)S))
  *
  * — each ONE shared-text division of DECIMAL(38,0) forms; mean and
  * variance reported from the same integers. s² ≤ m (Poisson-or-
  * under: no negative-binomial exists) → r and p NULL via CASE — the
  * honest answer is "use Poisson", not a garbage fit.
  *
  * Plan/scale: the q189 plan verbatim (one scan → calendar-bounded
  * cells → dense spine fill → ONE keyed aggregate → finish); the two
  * queries share `dailyOrderCells`, so the test and the fit read one
  * cohort. */
object NegBin {

  /** NB MoM fit per group from dense count cells (g, c). Returns
    * (g, n_periods, n_events, mean, variance, nb_r, nb_p). */
  def nbFit(counts: DataFrame): DataFrame =
    counts.groupBy("g")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n"),
        expr("CAST(sum(c) AS BIGINT)").as("s"),
        expr("CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))")
          .as("q"))
      .selectExpr("g", "n", "s", "q",
        // var numerator and the (s² − m)-cleared numerator, both exact
        "n * q - CAST(s AS DECIMAL(38,0)) * s AS vnum",
        "n * q - CAST(s AS DECIMAL(38,0)) * s - (n - 1) * s AS onum")
      .selectExpr("g", "n AS n_periods", "s AS n_events",
        "CASE WHEN n >= 1 THEN round(CAST(s AS DOUBLE)" +
          " / CAST(n AS DOUBLE), 6) + 0.0 END AS mean",
        "CASE WHEN n >= 2 THEN round(CAST(vnum AS DOUBLE)" +
          " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6) + 0.0" +
          " END AS variance",
        // overdispersed only: onum > 0 <=> s² > m
        "CASE WHEN n >= 2 AND onum > 0 THEN" +
          " round(CAST(CAST(s AS DECIMAL(38,0)) * s * (n - 1) AS DOUBLE)" +
          " / (CAST(n AS DOUBLE) * CAST(onum AS DOUBLE)), 4) + 0.0" +
          " END AS nb_r",
        "CASE WHEN n >= 2 AND onum > 0 THEN" +
          " round(CAST(s AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)" +
          " / CAST(vnum AS DOUBLE), 6) + 0.0 END AS nb_p")
      .orderBy("g")

  /** q253: the negative-binomial fit of daily order arrivals per
    * priority on the EXACT q189 cohort — q189 says "clumped", this
    * says with what (r, p); the synthetic-arrival generator and the
    * tail-quantile alarm read these two numbers. */
  def dailyOrderNegBin(spark: SparkSession, dir: String): DataFrame =
    nbFit(Overdispersion.dailyOrderCells(spark, dir))
      .withColumnRenamed("g", "o_priority")

  /** DuckDB twin: the q189 dense-spine SQL with the cleared-integer
    * fit finish. */
  val dailyOrderNegBinSql: String =
    """WITH cells AS (
      |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM orders
      |  WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
      |  GROUP BY 1, 2),
      |bounds AS (SELECT min(d) AS d_lo, max(d) AS d_hi FROM cells),
      |spine AS (
      |  SELECT unnest(generate_series(d_lo, d_hi)) AS d FROM bounds),
      |dense AS (
      |  SELECT grps.g, coalesce(cells.c, 0) AS c
      |  FROM spine CROSS JOIN (SELECT DISTINCT g FROM cells) grps
      |  LEFT JOIN cells ON cells.g = grps.g AND cells.d = spine.d),
      |agg AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(c) AS BIGINT) AS s,
      |    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q
      |  FROM dense GROUP BY 1),
      |forms AS (
      |  SELECT g, n, s, q,
      |    n * q - CAST(s AS HUGEINT) * s AS vnum,
      |    n * q - CAST(s AS HUGEINT) * s - (n - 1) * s AS onum
      |  FROM agg)
      |SELECT g AS o_priority, n AS n_periods, s AS n_events,
      |  CASE WHEN n >= 1 THEN round(CAST(s AS DOUBLE)
      |    / CAST(n AS DOUBLE), 6) + 0.0 END AS mean,
      |  CASE WHEN n >= 2 THEN round(CAST(vnum AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6) + 0.0
      |    END AS variance,
      |  CASE WHEN n >= 2 AND onum > 0 THEN
      |    round(CAST(CAST(s AS HUGEINT) * s * (n - 1) AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * CAST(onum AS DOUBLE)), 4) + 0.0
      |    END AS nb_r,
      |  CASE WHEN n >= 2 AND onum > 0 THEN
      |    round(CAST(s AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
      |    / CAST(vnum AS DOUBLE), 6) + 0.0 END AS nb_p
      |FROM forms ORDER BY 1""".stripMargin
}
