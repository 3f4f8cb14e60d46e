package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Weibull survival fit — the PARAMETRIC summary of the q110 curve.
  * KM (q110) is assumption-free but gives a staircase you cannot
  * extrapolate; the Weibull plot turns it into two interpretable
  * numbers via S(t) = exp(−(t/λ)^k):
  *
  *   ln(−ln S(t)) = k·ln t − k·ln λ
  *
  * — a straight line in (ln t, ln(−ln S)), so least squares over the
  * KM event points yields shape k (k < 1: churn hazard FALLS with
  * tenure — survivors harden; k > 1: hazard rises — ageing out) and
  * scale λ (the 63.2%-churned lifetime in days). The classical
  * "Weibull probability plot" estimator, distributed.
  *
  * Exactness: the input IS the registered q110 output (its SQL twin is
  * embedded verbatim as a CTE — one maintained derivation, the q267
  * reuse doctrine), so both engines see identical round-6 survival
  * steps; each plot coordinate is 1e-9-snap ln'd (composed snaps for
  * the double log) then 1e-6-floored to BIGINTs, per-group sums are
  * exact integers, and the slope/intercept/λ recovery is ONE
  * shared-text chain with the cross-products carried as
  * DECIMAL(38,0)/HUGEINT (n·Σxx overflows a Long past ~2k event
  * cells — the q68 stance).
  *
  * Plan/scale: everything after q110's own value-level chain operates
  * on EVENT-TIME cells (duration-range-bounded, never subject count) —
  * one keyed aggregate and a broadcast-scalar recovery. Zero
  * additional corpus passes. */
object Weibull {

  private def lnSnap(x: String): String =
    s"CAST(floor(ln($x) * 1e9 + 5e-1) AS DOUBLE) / 1e9"

  /** Plot coordinates: x = ln t, y = ln(−ln S), both snapped then
    * 1e-6-floored (exact ints; |y| ≤ ln(13.8)·1e6 at round-6 S). */
  private val XSql = s"CAST(floor((${lnSnap("CAST(t_days AS DOUBLE)")}) * 1e6) AS BIGINT)"
  private val YSql = s"CAST(floor((${lnSnap(s"(0.0 - (${lnSnap("survival")}))")}) * 1e6) AS BIGINT)"

  /** Shared slope/intercept/λ chain over exact per-group sums. */
  private def fitSelect(big: String): Seq[String] = Seq(
    s"CAST(n_pts AS $big) * sxy - CAST(sx AS $big) * sy AS num",
    s"CAST(n_pts AS $big) * sxx - CAST(sx AS $big) * sx AS den")
  private val KSql = "(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))"
  private val LambdaSql =
    // b0_micro = (Σy − k·Σx)/n; λ = exp(−b0/k) with b0 = b0_micro/1e6
    s"exp(0.0 - ((CAST(sy AS DOUBLE) - $KSql * CAST(sx AS DOUBLE))" +
      s" / CAST(n_pts AS DOUBLE) / 1e6) / $KSql)"

  /** Weibull plot fit from a KM frame with (g, t_days, survival):
    * event steps only, S strictly inside (0,1), t ≥ 1. One row per
    * group: (g, n_pts, shape_k, scale_days) — NULL fit when fewer
    * than 3 usable points, a singular spread, or a non-positive k. */
  def weibullFit(km: DataFrame): DataFrame =
    km
      .filter(col("t_days") >= 1 && col("survival") > 0.0 &&
        col("survival") < 1.0)
      .selectExpr("g", s"$XSql AS x", s"$YSql AS y")
      .groupBy("g")
      .agg(
        count(lit(1)).as("n_pts"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .selectExpr(Seq("g", "n_pts", "sx", "sy") ++
        fitSelect("DECIMAL(38,0)"): _*)
      .selectExpr("g", "n_pts",
        s"CASE WHEN n_pts >= 3 AND den <> 0 THEN round($KSql, 6) + 0.0 END" +
          " AS shape_k",
        s"CASE WHEN n_pts >= 3 AND den <> 0 AND $KSql > 0.0 THEN" +
          s" round($LambdaSql, 4) + 0.0 END AS scale_days")

  /** q281: parametric churn summary per market segment over the
    * registered q110 KM curve — is churn hazard rising or falling
    * with tenure, and what is the 63% lifetime? */
  def segmentWeibull(spark: SparkSession, dir: String): DataFrame =
    weibullFit(Survival.segmentChurn(spark, dir)
      .withColumnRenamed("c_mktsegment", "g"))
      .withColumnRenamed("g", "c_mktsegment")

  /** DuckDB twin: q110's FULL twin embedded as a CTE (one maintained
    * derivation), then the shared plot/fit chain. */
  val segmentWeibullSql: String =
    s"""WITH km AS (
       |${Survival.segmentChurnSql}
       |),
       |pts AS (
       |  SELECT c_mktsegment AS g, $XSql AS x, $YSql AS y
       |  FROM km
       |  WHERE t_days >= 1 AND survival > 0.0 AND survival < 1.0),
       |sums AS (
       |  SELECT g, count(*) AS n_pts,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
       |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
       |  FROM pts GROUP BY 1),
       |fit AS (
       |  SELECT g, n_pts, sx, sy,
       |    ${fitSelect("HUGEINT").mkString(",\n       |    ")}
       |  FROM sums)
       |SELECT g AS c_mktsegment, n_pts,
       |  CASE WHEN n_pts >= 3 AND den <> 0 THEN round($KSql, 6) + 0.0 END
       |    AS shape_k,
       |  CASE WHEN n_pts >= 3 AND den <> 0 AND $KSql > 0.0 THEN
       |    round($LambdaSql, 4) + 0.0 END AS scale_days
       |FROM fit""".stripMargin
}
