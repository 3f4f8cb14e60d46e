package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Poisson overdispersion test — the count-data diagnostic the event
  * deck presumes: arrival models (q118 cadence, q133 burstiness lean
  * on it informally) start from "is a Poisson rate even tenable?";
  * the variance-to-mean dispersion index answers it with a test:
  *
  *   D = s²/x̄,   z = (D − 1)·√((n−1)/2)
  *
  * (D ≈ 1 Poisson; D > 1 overdispersed — clumping/contagion; D < 1
  * underdispersed — regularity/rate limits), z from the asymptotic
  * normal of the index under H₀ (the χ²_{n−1} normal limit).
  *
  * Exactness: the dispersion index is a RATIO OF EXACT INTEGERS —
  * D = (n·Σc² − S²) / ((n−1)·S) with S = Σc — so the only doubles are
  * the one shared-text division and the z/p chain (sqrt IEEE-exact,
  * erfc via the A&S polynomial); empty/degenerate spines (S = 0 or
  * n < 2) go NULL via nullif/CASE. Counting cells are dense on the
  * calendar spine: a day with NO arrivals is a 0 count, not a missing
  * row — silently skipping zeros is the classic way this test lies.
  *
  * Plan/scale: one scan → (group, day) count cells (calendar-bounded)
  * → dense spine fill per group → one keyed aggregate → finish. */
object Overdispersion {

  /** Dispersion test per group from a count frame with (g, c): one row
    * per (group, period) with the period's exact BIGINT event count
    * (dense — include zero periods). Returns one row per group:
    * (g, n_periods, n_events, dispersion, z, p_value). */
  def dispersionTest(counts: DataFrame): DataFrame = {
    counts.groupBy("g")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_periods"),
        expr("CAST(sum(c) AS BIGINT)").as("n_events"),
        expr("CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))")
          .as("q"))
      .selectExpr("g", "n_periods", "n_events", "q",
        s"round($DSql, 6) + 0.0 AS dispersion")
      .selectExpr("g", "n_periods", "n_events", "dispersion",
        s"round($ZSql, 4) + 0.0 AS z")
      .selectExpr("g", "n_periods", "n_events", "dispersion", "z",
        s"round(${pTwoSidedSql("z")}, 6) + 0.0 AS p_value")
      .orderBy("g")
  }

  /** Shared-text D = (n·Σc² − S²)/((n−1)·S). */
  private val DSql =
    "(CASE WHEN n_periods < 2 THEN NULL ELSE" +
      " (CAST(n_periods AS DOUBLE) * CAST(q AS DOUBLE)" +
      " - CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE))" +
      " / nullif((CAST(n_periods AS DOUBLE) - 1.0)" +
      " * CAST(n_events AS DOUBLE), 0.0) END)"

  private val ZSql =
    "((dispersion - 1.0)" +
      " * sqrt((CAST(n_periods AS DOUBLE) - 1.0) / 2.0))"

  /** Two-sided normal p via the A&S 7.1.26 erfc chain. */
  private def pTwoSidedSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val poly = s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
    poly
  }

  /** The dense per-priority daily-count frame (g, c) — zero days are
    * real rows. Shared by q189's test and q253's negative-binomial
    * fit so both read ONE cohort. */
  private[operators] def dailyOrderCells(spark: SparkSession,
      dir: String): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_orderpriority").isNotNull)
      .groupBy(
        expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("g"),
        expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')")
          .as("d"))
      .agg(expr("CAST(count(1) AS BIGINT)").as("c"))
      .localCheckpoint(true) // feeds the spine bounds AND the fill
    val bounds = cells.agg(
      expr("CAST(min(d) AS BIGINT)").as("d_lo"),
      expr("CAST(max(d) AS BIGINT)").as("d_hi"))
    val groups = cells.select("g").distinct()
    val spine = bounds
      .selectExpr("explode(sequence(d_lo, d_hi)) AS d")
    spine.crossJoin(broadcast(groups))
      .join(cells, Seq("g", "d"), "left")
      .selectExpr("g", "coalesce(c, 0) AS c")
  }

  /** q189: are daily order arrivals Poisson within each priority, or
    * do orders clump? Dense calendar spine per priority — zero days
    * included. */
  def dailyOrderDispersion(spark: SparkSession, dir: String): DataFrame =
    dispersionTest(dailyOrderCells(spark, dir))
      .withColumnRenamed("g", "o_priority")

  /** DuckDB twin: identical dense spine and integer statistics. */
  val dailyOrderDispersionSql: String =
    s"""WITH cells AS (
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
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_periods,
       |    CAST(sum(c) AS BIGINT) AS n_events,
       |    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q
       |  FROM dense GROUP BY 1),
       |drow AS (
       |  SELECT g, n_periods, n_events, q, round($DSql, 6) + 0.0 AS dispersion
       |  FROM agg),
       |zrow AS (
       |  SELECT g, n_periods, n_events, dispersion, round($ZSql, 4) + 0.0 AS z
       |  FROM drow)
       |SELECT g AS o_priority, n_periods, n_events, dispersion, z,
       |  round(${pTwoSidedSql("z")}, 6) + 0.0 AS p_value
       |FROM zrow
       |ORDER BY o_priority""".stripMargin
}
