package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Atkinson inequality index at ε = 1 — the WELFARE-weighted member
  * of the inequality deck: q108's Gini reads rank-order dispersion,
  * q187's Theil decomposes entropy, but neither answers "what share
  * of total income could be given up with no welfare loss if it were
  * spread evenly?" — Atkinson's A is exactly that share, the number a
  * policy or mix report quotes when concentration has a COST. At the
  * canonical ε = 1 the index collapses to
  *
  *   A = 1 − geomean(x) / mean(x) = 1 − exp(Σln xᵢ / n) / μ
  *
  * with the equally-distributed equivalent (EDE) = geomean — the
  * per-entity value that, shared equally, matches observed welfare.
  *
  * Exactness: values arrive as exact BIGINT cents; the only
  * transcendentals are ln — snapped per row to the 1e-9 nano-nat grid
  * (the q187 Theil discipline) and summed as BIGINTs (order-free) —
  * and ONE exp at the end, snapped to the 1e-9 grid (the q94/q158 exp
  * convention: engine ulp differences cannot flip the round-6
  * boundary). Mean and count are exact integers; A is one shared-text
  * rational chain. Non-positive values are excluded (ln undefined)
  * and counted — the standard convention, shared with q187.
  *
  * Plan/scale: one keyed per-entity aggregate (the fact scan) → one
  * keyed per-group aggregate (dimension-grade) → a broadcast dimension
  * decorate. NO windows, no joins back to the fact: the ln snap rides
  * the first aggregate's projection. A thousand groups cost the same
  * two shuffles. */
object Atkinson {

  // shared-text finish: geomean via one snapped exp of the mean
  // nano-nat; A = 1 − geo/μ; round-6 report (+0.0 clears -0.0)
  private val GeoSql =
    "(CAST(floor(exp(CAST(sl AS DOUBLE) / 1e9 / CAST(n_pos AS DOUBLE))" +
      " * 1e9 + 5e-1) AS BIGINT) / 1e9)"
  private val MuSql = "(CAST(sx AS DOUBLE) / CAST(n_pos AS DOUBLE))"

  /** Atkinson(ε=1) per group from a frame with (g, x): group key and
    * BIGINT value per entity. One row per group: (g, n_pos,
    * n_excluded, mean_x, ede_x, atkinson) — NULL index when no
    * positive entities remain. */
  def atkinson(values: DataFrame): DataFrame =
    values.select("g", "x")
      .groupBy("g")
      .agg(
        expr("CAST(sum(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT)")
          .as("n_pos"),
        expr("CAST(sum(CASE WHEN x > 0 THEN 0 ELSE 1 END) AS BIGINT)")
          .as("n_excluded"),
        expr("CAST(sum(CASE WHEN x > 0 THEN x END) AS BIGINT)").as("sx"),
        expr("CAST(sum(CASE WHEN x > 0 THEN" +
          " CAST(floor(ln(CAST(x AS DOUBLE)) * 1e9 + 5e-1) AS BIGINT)" +
          " END) AS BIGINT)").as("sl"))
      .selectExpr("g", "n_pos", "n_excluded",
        s"CASE WHEN n_pos > 0 THEN round($MuSql, 4) + 0.0 END AS mean_x",
        s"CASE WHEN n_pos > 0 THEN round($GeoSql, 4) + 0.0 END AS ede_x",
        s"CASE WHEN n_pos > 0 THEN" +
          s" round(1.0 - $GeoSql / $MuSql, 6) + 0.0 END AS atkinson")

  /** q212: how unequal is customer lifetime revenue within each
    * nation, on the welfare scale — the q187 Theil frame (entities =
    * customers, cents), so the two indices read the same population
    * and a divergence between them (Atkinson weighs the poor tail,
    * Theil the whale head) is itself the diagnostic. */
  def nationRevenueAtkinson(spark: SparkSession, dir: String): DataFrame =
    atkinson(Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull && col("o_totalprice").isNotNull)
      .groupBy("o_custkey")
      .agg(expr("CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT))" +
        " AS BIGINT)").as("x"))
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_nationkey AS g", "x"))
      .withColumnRenamed("g", "c_nationkey")

  /** DuckDB twin: identical ln/exp snaps and integer sums. */
  val nationRevenueAtkinsonSql: String =
    s"""WITH base AS (
       |  SELECT c_nationkey AS g, x
       |  FROM (
       |    SELECT o_custkey,
       |      CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS x
       |    FROM orders
       |    WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
       |    GROUP BY 1)
       |  JOIN customer ON o_custkey = c_custkey),
       |grp AS (
       |  SELECT g,
       |    CAST(sum(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |    CAST(sum(CASE WHEN x > 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_excluded,
       |    CAST(sum(CASE WHEN x > 0 THEN x END) AS BIGINT) AS sx,
       |    CAST(sum(CASE WHEN x > 0 THEN
       |      CAST(floor(ln(CAST(x AS DOUBLE)) * 1e9 + 5e-1) AS BIGINT)
       |      END) AS BIGINT) AS sl
       |  FROM base GROUP BY 1)
       |SELECT g AS c_nationkey, n_pos, n_excluded,
       |  CASE WHEN n_pos > 0 THEN round($MuSql, 4) + 0.0 END AS mean_x,
       |  CASE WHEN n_pos > 0 THEN round($GeoSql, 4) + 0.0 END AS ede_x,
       |  CASE WHEN n_pos > 0 THEN
       |    round(1.0 - $GeoSql / $MuSql, 6) + 0.0 END AS atkinson
       |FROM grp""".stripMargin
}
