package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Moran's I spatial autocorrelation (Moran 1950) — the question the
  * geo deck (q33 spatial join, q90 geo binning) never asks: do
  * NEIGHBORING units carry similar values, or is the map noise?
  * Positive I = clustering (hot regions), negative = checkerboard
  * (neighbors anti-correlate), ≈ E[I] = −1/(n−1) = spatially random.
  * The pre-modeling diagnostic for any per-territory metric: a
  * significant I says territory effects are NOT independent and a
  * pooled model's SEs lie (the spatial sibling of q209's
  * Durbin–Watson, which reads the same disease on the TIME axis).
  *
  * I = (n/S₀) · (Σᵢⱼ wᵢⱼ zᵢ zⱼ) / (Σᵢ zᵢ²), z = x − x̄.
  *
  * EXACTNESS — the n-cancellation trick: the mean makes z rational,
  * but I is a RATIO of forms quadratic in z, so scaling z by n
  * cancels — compute Z = n·x − Σx (exact integers, DECIMAL(38,0)
  * products) and I = n·ΣwZZ / (S₀·ΣZ²) is ONE shared-text double
  * division of four exact integers. Nothing snaps. Constant surface
  * → ΣZ² = 0 → NULL via nullif.
  *
  * Plan/scale: one fact scan → unit-grade aggregate (25 nations;
  * a million geohash cells works the same way) → broadcast adjacency
  * self-join (pairs bounded by neighbor degree, never unit² when the
  * weight matrix is sparse — here region-blocked) → 1-row finish.
  * Isolated units (no neighbors) contribute no pair terms but stay
  * in n and ΣZ² (standard treatment; documented). */
object Moran {

  /** Moran's I over units (u, x BIGINT value) with a binary adjacency
    * frame (ui, uj), i ≠ j, symmetric. Returns ONE row
    * (n_units, s0, morans_i, e_i). */
  def moransI(units: DataFrame, adj: DataFrame): DataFrame = {
    val z = units
      .crossJoin(broadcast(units.agg(
        expr("CAST(count(1) AS BIGINT)").as("n"),
        expr("CAST(sum(x) AS BIGINT)").as("t"))))
      .selectExpr("u", "n", "CAST(n AS DECIMAL(38,0)) * x - t AS z")
      .localCheckpoint(true) // both pair sides + the diagonal sum
    val den = z.groupBy("n")
      .agg(expr("CAST(sum(z * z) AS DECIMAL(38,0))").as("den"))
    val num = adj
      .join(z.selectExpr("u AS ui", "z AS zi"), "ui")
      .join(broadcast(z.selectExpr("u AS uj", "z AS zj")), "uj")
      .agg(expr("CAST(coalesce(sum(zi * zj), 0) AS DECIMAL(38,0))").as("num"),
        expr("CAST(count(1) AS BIGINT)").as("s0"))
    num.crossJoin(broadcast(den))
      .selectExpr("n AS n_units", "s0",
        "round(CAST(n AS DOUBLE) * CAST(num AS DOUBLE) /" +
          " nullif(CAST(s0 AS DOUBLE) * CAST(den AS DOUBLE), 0e0), 6)" +
          " + 0.0 AS morans_i",
        "round(-1e0 / nullif(CAST(n AS DOUBLE) - 1e0, 0e0), 6)" +
          " + 0.0 AS e_i")
  }

  /** q249: do same-region (neighboring) nations hold similar customer
    * balance mass? Units = 25 nations, x = exact total balance cents,
    * adjacency = shared region minus self (the region-block weight
    * matrix). */
  def nationBalanceMoran(spark: SparkSession, dir: String): DataFrame = {
    val units = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").as("u"))
      .agg(expr("CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT))" +
        " AS BIGINT)").as("x"))
      // nations with no customers still exist on the map: left join
      // from the nation spine, zero-filled
      .join(Tables.nation(spark, dir).selectExpr("n_nationkey AS u"),
        Seq("u"), "right")
      .selectExpr("u", "coalesce(x, CAST(0 AS BIGINT)) AS x")
    val nk = Tables.nation(spark, dir)
      .selectExpr("n_nationkey AS k", "n_regionkey AS r")
    val adj = nk.as("a").join(nk.selectExpr("k AS k2", "r AS r2").as("b"),
      expr("a.r = b.r2 AND a.k <> b.k2"))
      .selectExpr("a.k AS ui", "b.k2 AS uj")
    moransI(units, adj)
  }

  /** DuckDB twin: identical integer forms, one shared-text division. */
  val nationBalanceMoranSql: String =
    """WITH units AS (
      |  SELECT n.n_nationkey AS u,
      |    coalesce(CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT))
      |      AS BIGINT), 0) AS x
      |  FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS t
      |  FROM units),
      |z AS (
      |  SELECT u, n, CAST(n AS DECIMAL(38,0)) * x - t AS z
      |  FROM units CROSS JOIN tot),
      |den AS (
      |  SELECT n, CAST(sum(z * z) AS DECIMAL(38,0)) AS den
      |  FROM z GROUP BY 1),
      |adj AS (
      |  SELECT a.n_nationkey AS ui, b.n_nationkey AS uj
      |  FROM nation a JOIN nation b
      |    ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey),
      |num AS (
      |  SELECT CAST(coalesce(sum(zi.z * zj.z), 0) AS DECIMAL(38,0)) AS num,
      |    CAST(count(*) AS BIGINT) AS s0
      |  FROM adj JOIN z zi ON zi.u = adj.ui JOIN z zj ON zj.u = adj.uj)
      |SELECT n AS n_units, s0,
      |  round(CAST(n AS DOUBLE) * CAST(num AS DOUBLE) /
      |    nullif(CAST(s0 AS DOUBLE) * CAST(den AS DOUBLE), 0e0), 6)
      |    + 0.0 AS morans_i,
      |  round(-1e0 / nullif(CAST(n AS DOUBLE) - 1e0, 0e0), 6)
      |    + 0.0 AS e_i
      |FROM num CROSS JOIN den""".stripMargin
}
