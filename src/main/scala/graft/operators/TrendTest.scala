package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cochran–Armitage trend test — "does the success rate move
  * MONOTONICALLY with an ordered exposure level?" The 2×k companion of
  * q91 (chi-square asks only IS there association — it burns k−1 df
  * and misses ordered structure) and q132 (two proportions; this is
  * the k-level ordered generalization): with integer scores wᵢ per
  * level, T = Σwᵢxᵢ − X·(Σwᵢnᵢ)/N and
  * Var(T) = p̄(1−p̄)·[Σwᵢ²nᵢ − (Σwᵢnᵢ)²/N], z = T/√Var — one df spent
  * exactly on the trend direction, which is why it dominates chi-square
  * against monotone alternatives.
  *
  * Exactness: the five sufficient statistics (N, X, s1 = Σwn,
  * s2 = Σw²n, sxw = Σwx) are exact BIGINTs from ONE map-side-combined
  * cell aggregate; the statistic is integer-cleared — t_num =
  * N·sxw − X·s1 stays a Long (≤ ~10¹³ at sf1, w ≤ 5), while var_num =
  * X·(N−X)·(N·s2 − s1²) reaches ~10²⁵ and is carried as DECIMAL(38,0)
  * in Spark / HUGEINT in DuckDB (the q152 stance) — and
  * z = t_num / sqrt(var_num / N) is ONE shared-text double chain,
  * round-4 snapped before the A&S erfc p (the q100 convention).
  * Var = 0 (all-success, all-failure, or a single level) yields NULL z
  * via nullif, never garbage.
  *
  * Plan/scale: one scan → one k-row cell aggregate → one 1-row
  * aggregate. Nothing else. */
object TrendTest {

  /** Trend z/p from a frame with (w, succ): integer level score ≥ 1
    * and a 0/1 outcome. Returns one row: n_total, k_levels, successes,
    * z_ca, p_value. */
  def cochranArmitage(rows: DataFrame): DataFrame =
    fromCells(rows
      .groupBy("w")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_c"),
        expr("CAST(sum(succ) AS BIGINT)").as("x_c")))

  /** The same test from pre-aggregated level cells (w, n_c, x_c) —
    * the entry the streaming twin's compacted changelog feeds
    * ([[graft.streaming.TrendStream]]). */
  def fromCells(cells: DataFrame): DataFrame =
    cells
      .agg(
        expr("CAST(sum(n_c) AS BIGINT)").as("n_total"),
        expr("CAST(count(1) AS BIGINT)").as("k_levels"),
        expr("CAST(sum(x_c) AS BIGINT)").as("x_total"),
        expr("CAST(sum(w * n_c) AS BIGINT)").as("s1"),
        expr("CAST(sum(w * w * n_c) AS BIGINT)").as("s2"),
        expr("CAST(sum(w * x_c) AS BIGINT)").as("sxw"))
      .selectExpr("n_total", "k_levels", "x_total",
        "n_total * sxw - x_total * s1 AS t_num",
        "CAST(x_total AS DECIMAL(38,0)) * (n_total - x_total)" +
          " * (n_total * s2 - s1 * s1) AS var_num")
      .selectExpr("n_total", "k_levels", "x_total",
        s"round($ZSql, 4) + 0.0 AS z_ca")
      .selectExpr("n_total", "k_levels", "x_total AS successes", "z_ca",
        s"round(${pSql("z_ca")}, 6) + 0.0 AS p_value")

  /** Shared-text z: t_num / sqrt(var_num / N) — NULL when Var = 0. */
  private val ZSql =
    "CAST(t_num AS DOUBLE) / sqrt(nullif(CAST(var_num AS DOUBLE), 0.0)" +
      " / CAST(n_total AS DOUBLE))"

  /** Two-sided normal p via A&S 7.1.26 (the q100 shared chain). */
  private def pSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
  }

  /** q168: does the order FINISH rate trend with the order's priority
    * level (1-URGENT … 5-LOW, scored 1..5)? */
  def priorityFinishTrend(spark: SparkSession, dir: String): DataFrame =
    cochranArmitage(Tables.orders(spark, dir)
      .filter(col("o_orderpriority").isNotNull && col("o_orderstatus").isNotNull)
      .selectExpr(
        "CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS succ"))

  /** DuckDB twin: identical cells, integer clearing, z/p chain. */
  val priorityFinishTrendSql: String =
    s"""WITH cells AS (
       |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w,
       |    CAST(count(*) AS BIGINT) AS n_c,
       |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS x_c
       |  FROM orders
       |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
       |  GROUP BY 1),
       |sums AS (
       |  SELECT CAST(sum(n_c) AS BIGINT) AS n_total,
       |    CAST(count(*) AS BIGINT) AS k_levels,
       |    CAST(sum(x_c) AS BIGINT) AS x_total,
       |    CAST(sum(w * n_c) AS BIGINT) AS s1,
       |    CAST(sum(w * w * n_c) AS BIGINT) AS s2,
       |    CAST(sum(w * x_c) AS BIGINT) AS sxw
       |  FROM cells),
       |num AS (
       |  SELECT n_total, k_levels, x_total,
       |    n_total * sxw - x_total * s1 AS t_num,
       |    CAST(x_total AS HUGEINT) * (n_total - x_total)
       |      * (n_total * s2 - s1 * s1) AS var_num
       |  FROM sums),
       |z AS (
       |  SELECT n_total, k_levels, x_total,
       |    round($ZSql, 4) + 0.0 AS z_ca
       |  FROM num)
       |SELECT n_total, k_levels, x_total AS successes, z_ca,
       |  round(${pSql("z_ca")}, 6) + 0.0 AS p_value
       |FROM z""".stripMargin
}
