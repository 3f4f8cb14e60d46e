package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Hosmer–Lemeshow goodness-of-fit test — the TEST companion of
  * q156's descriptive ECE: the reliability diagram shows HOW the
  * forecast miscalibrates, ECE averages the gaps; HL asks "is the
  * miscalibration statistically real, or noise at this sample size?"
  *
  *   HL = Σ_groups (O_g − E_g)² / (E_g·(1 − p_g)) ~ χ²_{G−2}
  *
  * over the natural forecast groups (the q156 model is a per-year
  * empirical rate fitted on the hash TRAIN split — each year IS a
  * constant-forecast group, the textbook grouping when predictions
  * are piecewise constant; decile binning would be vacuous on ≤10
  * distinct forecasts, documented).
  *
  * Exactness: the q156 micro fixed point makes every cell term an
  * EXACT integer ratio — O, E and p carry as micro units, so
  * (O−E)²/(E(1−p)) = (10⁶·x − e_µ)²/(e_µ·(10⁶ − p_µ)) with both
  * sides exact BIGINT/DECIMAL products; each term is one shared-text
  * division micro-floored and summed as a BIGINT (q91 move).
  * Degenerate groups (E = 0 or p = 1 — zero denominator, no
  * information) are excluded ALGEBRAICALLY and counted; HL is
  * round-4 snapped, then the χ²_G upper tail runs the q173
  * Wilson–Hilferty + A&S erfc chain (pow 1e-9-snapped). df = G (not
  * the in-sample G−2 convention): the model is fitted on the hash
  * TRAIN split and evaluated on the held-out eval split, where the
  * statistic is ~χ²_G — the external-validation form (r13 ADVICE:
  * G−2 on a held-out split is anti-conservative). G < 3 → NULL (the
  * statistic is uninformative on fewer cells).
  *
  * Plan/scale: the q156 audit frame (one scan → calendar-bounded
  * per-year aggregates → broadcast model join) → ONE 1-row aggregate.
  * No windows. */
object HosmerLemeshow {

  // dd and the denominator both carry 1e12 micro² factors, so the
  // ratio is ALREADY in natural χ² units; floor it to 1e-6 grid
  private val TermSql =
    "CASE WHEN e_mu > 0 AND p_micro < 1000000 THEN" +
      " CAST(floor(CAST(dd AS DOUBLE) * CAST(dd AS DOUBLE)" +
      " / (CAST(e_mu AS DOUBLE) * CAST(1000000 - p_micro AS DOUBLE))" +
      " * 1e6) AS DECIMAL(38,0)) END"

  private val HlSql = "round(CAST(ts AS DOUBLE) / 1e6, 4) + 0.0"

  private val ZSql = {
    // held-out evaluation: df = G, the external-validation form
    val df = "CAST(n_groups AS DOUBLE)"
    val cb = s"(CAST(floor(pow(hl / $df," +
      " 0.3333333333333333) * 1e9 + 0.5) AS DOUBLE) / 1e9)"
    val mu = s"(1.0 - 2.0 / (9.0 * $df))"
    val sd = s"sqrt(2.0 / (9.0 * $df))"
    s"(($cb - $mu) / $sd)"
  }
  private def pUpperSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val poly = s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741)" +
      s" * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
    s"(CASE WHEN $z >= 0.0 THEN $poly / 2.0 ELSE 1.0 - $poly / 2.0 END)"
  }

  /** HL from a grouped forecast frame (grp, n_ev, x_ev, p_micro):
    * group size, observed events, micro-unit forecast rate. One row:
    * (n_groups, n_degenerate, hl, df, p_value). */
  def hosmerLemeshow(groups: DataFrame): DataFrame =
    groups
      .selectExpr("n_ev", "x_ev", "p_micro",
        "CAST(n_ev AS DECIMAL(38,0)) * p_micro AS e_mu")
      .withColumn("dd",
        expr("CAST(x_ev AS DECIMAL(38,0)) * 1000000 - e_mu"))
      .agg(
        expr("CAST(sum(CASE WHEN e_mu > 0 AND p_micro < 1000000" +
          " THEN 1 ELSE 0 END) AS BIGINT)").as("n_groups"),
        expr("CAST(sum(CASE WHEN e_mu > 0 AND p_micro < 1000000" +
          " THEN 0 ELSE 1 END) AS BIGINT)").as("n_degenerate"),
        expr(s"CAST(sum($TermSql) AS DECIMAL(38,0))").as("ts"))
      .selectExpr("n_groups", "n_degenerate",
        s"CASE WHEN n_groups >= 3 THEN $HlSql END AS hl",
        "CASE WHEN n_groups >= 3 THEN CAST(n_groups AS BIGINT) END AS df")
      .selectExpr("n_groups", "n_degenerate", "hl", "df",
        s"CASE WHEN hl IS NOT NULL THEN" +
          s" round(${pUpperSql(ZSql)}, 6) + 0.0 END AS p_value")

  /** q223: is the q156 per-year finish-rate forecast statistically
    * calibrated on the eval split — the TEST on the exact q156/q167
    * audit frame (descriptive ECE there, the χ² verdict here). */
  def calibrationHl(spark: SparkSession, dir: String): DataFrame =
    hosmerLemeshow(Calibration.evalFrame(spark, dir))

  /** DuckDB twin: the q156 CTE prefix, identical micro cells and
    * chains. */
  val calibrationHlSql: String =
    s"""WITH rows_ AS (
       |  SELECT year(CAST(o_orderdate AS DATE)) AS yr,
       |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS conv,
       |    ${graft.functions.Hashing.hash48Sql(
             Calibration.Seed, "(o_orderkey)::VARCHAR")} % 10 AS b
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_orderstatus IS NOT NULL),
       |model AS (
       |  SELECT yr, (1000000 * CAST(sum(conv) AS BIGINT)) // count(*) AS p_micro
       |  FROM rows_ WHERE b < 5 GROUP BY 1),
       |ev AS (
       |  SELECT yr, CAST(count(*) AS BIGINT) AS n_ev,
       |    CAST(sum(conv) AS BIGINT) AS x_ev
       |  FROM rows_ WHERE b >= 5 GROUP BY 1),
       |cells AS (
       |  SELECT n_ev, x_ev, p_micro,
       |    CAST(n_ev AS HUGEINT) * p_micro AS e_mu,
       |    CAST(x_ev AS HUGEINT) * 1000000
       |      - CAST(n_ev AS HUGEINT) * p_micro AS dd
       |  FROM ev JOIN model USING (yr)),
       |agg AS (
       |  SELECT
       |    CAST(sum(CASE WHEN e_mu > 0 AND p_micro < 1000000
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_groups,
       |    CAST(sum(CASE WHEN e_mu > 0 AND p_micro < 1000000
       |      THEN 0 ELSE 1 END) AS BIGINT) AS n_degenerate,
       |    CAST(sum(${TermSql.replace("DECIMAL(38,0)", "HUGEINT")}) AS HUGEINT)
       |      AS ts
       |  FROM cells),
       |stat AS (
       |  SELECT n_groups, n_degenerate,
       |    CASE WHEN n_groups >= 3 THEN $HlSql END AS hl,
       |    CASE WHEN n_groups >= 3 THEN CAST(n_groups AS BIGINT) END AS df
       |  FROM agg)
       |SELECT n_groups, n_degenerate, hl, df,
       |  CASE WHEN hl IS NOT NULL THEN
       |    round(${pUpperSql(ZSql)}, 6) + 0.0 END AS p_value
       |FROM stat""".stripMargin
}
