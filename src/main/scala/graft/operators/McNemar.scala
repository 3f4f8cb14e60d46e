package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** McNemar's test for PAIRED proportions — "did the same subjects
  * change?" The within-subject companion of q132 (two independent
  * proportions) and q91 (unpaired independence): with each subject
  * observed under two conditions, only the DISCORDANT pairs carry
  * information — b subjects flipped 0→1, c flipped 1→0, and
  * z = (b − c)/√(b + c) tests marginal homogeneity. Comparing the two
  * marginal rates with q132 would double-count the concordant mass and
  * understate the evidence; this is the correct test for
  * before/after panels (did a cohort's behavior change year over
  * year?), A/A' relabeling audits, and paired-annotator flips (the
  * q136 kappa frame asked "do they agree?" — this asks "do their
  * MARGINS differ?").
  *
  * Exactness: the four pair cells (both-yes, b, c, n) are exact
  * BIGINTs from one subject-grade aggregate; z is ONE shared-text
  * double chain over them, round-4 snapped, then the A&S erfc p
  * (the q100 convention, round-6). b + c = 0 (no discordant pairs)
  * yields NULL z/p via nullif, never garbage. No continuity
  * correction (documented choice — both engines run the identical
  * text; the CC'd variant is a one-line edit on both sides).
  *
  * Plan/scale: one scan → one subject-keyed map-side-combined
  * aggregate (the pairing) → one 1-row aggregate. The pairing shuffle
  * carries (subject, two 0/1 maxima) — nothing row-bounded after the
  * scan. */
object McNemar {

  /** McNemar z/p from a frame with 0/1 columns `x_a`, `x_b` (one row
    * per paired subject). Returns one row:
    * (n_pairs, both_yes, b_disc, c_disc, z_mcnemar, p_value). */
  def mcnemar(pairs: DataFrame): DataFrame =
    pairs.agg(
      expr("CAST(count(1) AS BIGINT)").as("n_pairs"),
      expr("CAST(sum(x_a * x_b) AS BIGINT)").as("both_yes"),
      expr("CAST(sum((1 - x_a) * x_b) AS BIGINT)").as("b_disc"),
      expr("CAST(sum(x_a * (1 - x_b)) AS BIGINT)").as("c_disc"))
      .selectExpr("n_pairs", "both_yes", "b_disc", "c_disc",
        s"round($ZSql, 4) + 0.0 AS z_mcnemar")
      .selectExpr("n_pairs", "both_yes", "b_disc", "c_disc", "z_mcnemar",
        s"round(${pSql("z_mcnemar")}, 6) + 0.0 AS p_value")

  /** Shared-text z = (b − c)/√(b + c) — NULL when b + c = 0. */
  private val ZSql =
    "CAST(b_disc - c_disc AS DOUBLE)" +
      " / sqrt(nullif(CAST(b_disc + c_disc AS DOUBLE), 0.0))"

  /** Two-sided normal p via A&S 7.1.26 (the q100 shared chain). */
  private def pSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
  }

  /** q169: among customers ordering in BOTH 1996 and 1997, did the
    * share placing at least one URGENT-priority order change? The
    * subject is the customer; the condition is the year. */
  def customerUrgencyShift(spark: SparkSession, dir: String): DataFrame =
    mcnemar(Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull
        && col("o_orderpriority").isNotNull)
      .selectExpr("o_custkey AS cust",
        "year(CAST(o_orderdate AS DATE)) AS yr",
        "CASE WHEN substring(o_orderpriority, 1, 1) = '1' THEN 1 ELSE 0 END AS urgent")
      .filter(col("yr").isin(1996, 1997))
      .groupBy("cust")
      .agg(expr("max(CASE WHEN yr = 1996 THEN urgent END)").as("x_a"),
        expr("max(CASE WHEN yr = 1997 THEN urgent END)").as("x_b"))
      .filter(col("x_a").isNotNull && col("x_b").isNotNull))

  /** DuckDB twin: identical pairing and z/p chain. */
  val customerUrgencyShiftSql: String =
    s"""WITH rows_ AS (
       |  SELECT o_custkey AS cust, year(CAST(o_orderdate AS DATE)) AS yr,
       |    CASE WHEN substring(o_orderpriority, 1, 1) = '1' THEN 1 ELSE 0 END AS urgent
       |  FROM orders
       |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
       |    AND o_orderpriority IS NOT NULL
       |    AND year(CAST(o_orderdate AS DATE)) IN (1996, 1997)),
       |pairs AS (
       |  SELECT cust,
       |    max(CASE WHEN yr = 1996 THEN urgent END) AS x_a,
       |    max(CASE WHEN yr = 1997 THEN urgent END) AS x_b
       |  FROM rows_ GROUP BY 1),
       |cells AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(x_a * x_b) AS BIGINT) AS both_yes,
       |    CAST(sum((1 - x_a) * x_b) AS BIGINT) AS b_disc,
       |    CAST(sum(x_a * (1 - x_b)) AS BIGINT) AS c_disc
       |  FROM pairs WHERE x_a IS NOT NULL AND x_b IS NOT NULL),
       |z AS (
       |  SELECT n_pairs, both_yes, b_disc, c_disc,
       |    round($ZSql, 4) + 0.0 AS z_mcnemar
       |  FROM cells)
       |SELECT n_pairs, both_yes, b_disc, c_disc, z_mcnemar,
       |  round(${pSql("z_mcnemar")}, 6) + 0.0 AS p_value
       |FROM z""".stripMargin
}
