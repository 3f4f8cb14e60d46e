package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bartlett's test of equal variances — the NORMAL-THEORY partner of
  * q182's Brown–Forsythe. BF trades power for robustness (medians,
  * absolute deviations); Bartlett is the likelihood-ratio test proper
  * and is the sharper instrument exactly when the q180/q215 normality
  * checks pass. Reading the pair together is the variance analogue of
  * reading q96 beside q97:
  *
  *   B = [(N−k)·ln s_p² − Σ(n_i−1)·ln s_i²] / C,
  *   C = 1 + (Σ 1/(n_i−1) − 1/(N−k)) / (3(k−1)),    B ~ χ²_{k−1}
  *
  * Exactness: per-group (n, Σx, Σx²) are exact integer-cent sums
  * (DECIMAL(38,0) — Σx² passes 2^63); each group's SS is floored to
  * an exact integer BEFORE pooling (order-free), each ln is
  * 1e-9-snapped and integer-scaled so the numerator is exact integer
  * nano-nats; the 1/(n_i−1) series is 1e-12-floored per group. The
  * χ² tail rides the q173 Wilson–Hilferty + A&S chain (the q182
  * route). Any group with n < 2 or zero variance → NULL, never a ln
  * domain error.
  *
  * Plan/scale: one scan → one map-side-combined group aggregate →
  * one 1-row finish. Nothing else. */
object Bartlett {

  private def lnSnap(x: String): String =
    s"CAST(floor(ln($x) * 1e9 + 5e-1) AS DOUBLE) / 1e9"

  /** Per-group derived columns over exact sums. */
  private val SsSql = // integer-floored within-group SS
    "CAST(floor(CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)" +
      " / CAST(n AS DOUBLE)) AS DECIMAL(38,0))"
  private val S2Sql = // group variance from the floored SS (shared)
    "(CAST(ss AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0))"

  /** 1-row tail from the group frame (n, ss, t_nano, inv_p): the
    * shared Bartlett chain. */
  private val BSql =
    "((CAST(nk AS DOUBLE) * CAST(lnsp_int AS DOUBLE) / 1e9" +
      " - CAST(t_sum AS DOUBLE) / 1e9) / c_corr)"

  /** Bartlett B/p from (g, x): group key + exact integer value. One
    * row: (n_rows, k_groups, b_stat, z_wh, p_value). */
  def bartlett(rows: DataFrame): DataFrame = {
    val grp = rows
      .filter(col("g").isNotNull && col("x").isNotNull)
      .groupBy("g")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n"),
        expr("CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("s"),
        expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))")
          .as("q"))
      .selectExpr("g", "n", s"$SsSql AS ss")
      .selectExpr("n", "ss",
        // per-group nano-nat term (n−1)·ln s²; NULL marks degenerates
        s"CASE WHEN n >= 2 AND ss > 0 THEN" +
          s" CAST((n - 1) * CAST(floor(ln($S2Sql) * 1e9 + 5e-1) AS BIGINT)" +
          s" AS BIGINT) END AS t_nano",
        "CASE WHEN n >= 2 THEN" +
          " CAST(floor(1e12 / (CAST(n AS DOUBLE) - 1.0)) AS BIGINT)" +
          " END AS inv_p")
    grp.agg(
      expr("CAST(sum(n) AS BIGINT)").as("n_rows"),
      expr("CAST(count(1) AS BIGINT)").as("k_groups"),
      expr("CAST(sum(ss) AS DECIMAL(38,0))").as("ssw"),
      expr("CAST(sum(t_nano) AS BIGINT)").as("t_sum"),
      expr("CAST(sum(inv_p) AS BIGINT)").as("inv_sum"),
      expr("CAST(sum(CAST(t_nano IS NULL AS INT)) AS BIGINT)").as("n_bad"))
      .selectExpr("n_rows", "k_groups", "ssw", "t_sum", "inv_sum", "n_bad",
        "n_rows - k_groups AS nk")
      .selectExpr("n_rows", "k_groups", "t_sum", "inv_sum", "n_bad", "nk",
        s"CASE WHEN n_bad = 0 AND k_groups >= 2 AND ssw > 0 THEN" +
          s" CAST(floor(ln(CAST(ssw AS DOUBLE) / CAST(nk AS DOUBLE))" +
          s" * 1e9 + 5e-1) AS BIGINT) END AS lnsp_int",
        "(1.0 + (CAST(inv_sum AS DOUBLE) / 1e12" +
          " - 1.0 / CAST(nk AS DOUBLE))" +
          " / (3.0 * (CAST(k_groups AS DOUBLE) - 1.0))) AS c_corr")
      .selectExpr("n_rows", "k_groups",
        s"CASE WHEN lnsp_int IS NOT NULL THEN round($BSql, 4) + 0.0 END" +
          " AS b_stat")
      .selectExpr("n_rows", "k_groups", "b_stat",
        s"round($ZSql, 4) + 0.0 AS z_wh")
      .selectExpr("n_rows", "k_groups", "b_stat", "z_wh",
        s"round(${pUpperSql("z_wh")}, 6) + 0.0 AS p_value")
  }

  /** Wilson–Hilferty z for B at df = k−1 (the q173/q182 chain). */
  private val ZSql = {
    val df = "CAST(k_groups - 1 AS DOUBLE)"
    val cb = s"(CAST(floor(pow(b_stat / $df," +
      " 0.3333333333333333) * 1e9 + 0.5) AS DOUBLE) / 1e9)"
    val mu = s"(1.0 - 2.0 / (9.0 * $df))"
    val sd = s"sqrt(2.0 / (9.0 * $df))"
    s"(CASE WHEN b_stat IS NULL OR k_groups < 2 THEN NULL" +
      s" ELSE ($cb - $mu) / $sd END)"
  }

  /** One-sided upper-tail normal p via the A&S 7.1.26 erfc chain. */
  private def pUpperSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val poly = s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741)" +
      s" * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
    s"(CASE WHEN $z >= 0.0 THEN $poly / 2.0 ELSE 1.0 - $poly / 2.0 END)"
  }

  /** q304: Bartlett on q182's exact frame (order value in cents per
    * priority) — read the robust and likelihood-ratio verdicts side
    * by side. */
  def priorityValueBartlett(spark: SparkSession, dir: String): DataFrame =
    bartlett(Tables.orders(spark, dir)
      .filter(col("o_orderpriority").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS x"))

  /** DuckDB twin: identical sums, floors, snapped lns, WH tail. */
  val priorityValueBartlettSql: String =
    s"""WITH base AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS x
       |  FROM orders
       |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
       |grp AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS s,
       |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
       |  FROM base GROUP BY 1),
       |ss AS (
       |  SELECT g, n, ${SsSql.replace("DECIMAL(38,0)", "HUGEINT")} AS ss
       |  FROM grp),
       |terms AS (
       |  SELECT n, ss,
       |    CASE WHEN n >= 2 AND ss > 0 THEN
       |      CAST((n - 1) * CAST(floor(ln($S2Sql) * 1e9 + 5e-1) AS BIGINT)
       |      AS BIGINT) END AS t_nano,
       |    CASE WHEN n >= 2 THEN
       |      CAST(floor(1e12 / (CAST(n AS DOUBLE) - 1.0)) AS BIGINT)
       |      END AS inv_p
       |  FROM ss),
       |tot AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       |    CAST(count(*) AS BIGINT) AS k_groups,
       |    CAST(sum(ss) AS HUGEINT) AS ssw,
       |    CAST(sum(t_nano) AS BIGINT) AS t_sum,
       |    CAST(sum(inv_p) AS BIGINT) AS inv_sum,
       |    CAST(sum(CAST(t_nano IS NULL AS INT)) AS BIGINT) AS n_bad
       |  FROM terms),
       |pooled AS (
       |  SELECT n_rows, k_groups, t_sum, inv_sum, n_bad,
       |    n_rows - k_groups AS nk,
       |    CASE WHEN n_bad = 0 AND k_groups >= 2 AND ssw > 0 THEN
       |      CAST(floor(ln(CAST(ssw AS DOUBLE) / CAST(n_rows - k_groups
       |        AS DOUBLE)) * 1e9 + 5e-1) AS BIGINT) END AS lnsp_int,
       |    (1.0 + (CAST(inv_sum AS DOUBLE) / 1e12
       |      - 1.0 / CAST(n_rows - k_groups AS DOUBLE))
       |      / (3.0 * (CAST(k_groups AS DOUBLE) - 1.0))) AS c_corr
       |  FROM tot),
       |bstat AS (
       |  SELECT n_rows, k_groups,
       |    CASE WHEN lnsp_int IS NOT NULL THEN round($BSql, 4) + 0.0 END
       |      AS b_stat
       |  FROM pooled),
       |zed AS (
       |  SELECT n_rows, k_groups, b_stat, round($ZSql, 4) + 0.0 AS z_wh
       |  FROM bstat)
       |SELECT n_rows, k_groups, b_stat, z_wh,
       |  round(${pUpperSql("z_wh")}, 6) + 0.0 AS p_value
       |FROM zed""".stripMargin
}
