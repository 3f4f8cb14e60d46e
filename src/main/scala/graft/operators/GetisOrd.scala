package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Getis–Ord Gi* hot-spot statistic — the PER-UNIT answer to the
  * question q249's Moran's I answers globally. Moran says "the map
  * clusters"; an operations owner needs WHICH units run hot. With
  * binary weights over the closed neighborhood N(i) (self included —
  * the * in Gi*), W_i = |N(i)|:
  *
  *   Gi* = (Σ_{j∈N(i)} x_j − W_i·x̄)
  *         / (S·√((n·W_i − W_i²)/(n−1)))          ~  N(0,1)
  *
  * — a z-score per unit; |z| > 1.96 marks the 5% hot (+) / cold (−)
  * spots in the field the global I only summarizes.
  *
  * Exactness: the q249 n-cancellation trick extended to Gi* — with
  * exact integer totals T = Σx, Q = Σx², and neighborhood sums
  * B_i = Σ_{N(i)} x, multiply the ratio through by n:
  *
  *   z_i = (n·B_i − W_i·T) / √((n·Q − T²)·(n·W_i − W_i²)/(n−1))
  *
  * numerator and both radicand factors are exact DECIMAL(38,0)
  * integers; ONE shared-text double chain per unit, round-6, and the
  * hot/cold flag compares the ROUNDED z (deterministic in both
  * engines). Constant surface → n·Q = T² → NULL via nullif.
  *
  * Plan/scale: one fact scan → unit-grade aggregate → broadcast
  * adjacency join + one keyed neighborhood aggregate (pairs bounded
  * by neighbor degree — sparse-weight discipline, same as q249) →
  * per-unit closed form. A million geohash cells works identically;
  * only the adjacency degree matters. */
object GetisOrd {

  /** Gi* per unit from units (u, x BIGINT) and a symmetric adjacency
    * (ui, uj) WITHOUT self-loops (the closed neighborhood is formed
    * here). One row per unit: (u, w_i, gi_z, hot). */
  def giStar(units: DataFrame, adj: DataFrame): DataFrame = {
    val tot = units.agg(
      expr("CAST(count(1) AS BIGINT)").as("n"),
      expr("CAST(sum(x) AS BIGINT)").as("t"),
      expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))")
        .as("q"))
    // closed neighborhood: the unit itself joins its open neighbors
    val closed = adj
      .unionByName(units.selectExpr("u AS ui", "u AS uj"))
    val hood = closed
      .join(broadcast(units.selectExpr("u AS uj", "x AS xj")), "uj")
      .groupBy(col("ui").as("u"))
      .agg(
        expr("CAST(sum(xj) AS BIGINT)").as("b"),
        expr("CAST(count(1) AS BIGINT)").as("w_i"))
    hood
      .crossJoin(broadcast(tot))
      .selectExpr("u", "w_i",
        "CAST(n AS DECIMAL(38,0)) * b - CAST(w_i AS DECIMAL(38,0)) * t AS num",
        "CAST(n AS DECIMAL(38,0)) * q - CAST(t AS DECIMAL(38,0)) * t AS vq",
        "n * w_i - w_i * w_i AS vw", "n")
      .selectExpr("u", "w_i",
        "round(CAST(num AS DOUBLE) / nullif(sqrt(CAST(vq AS DOUBLE)" +
          " * CAST(vw AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)), 0.0), 6)" +
          " + 0.0 AS gi_z")
      .selectExpr("u", "w_i", "gi_z",
        "CASE WHEN gi_z > 1.96 THEN 1 WHEN gi_z < -1.96 THEN -1" +
          " ELSE 0 END AS hot")
  }

  /** q286: which nations run hot or cold on customer balance mass
    * within their region neighborhood — the unit-level drill-down of
    * q249's global verdict, on the identical units and weights. */
  def nationBalanceGiStar(spark: SparkSession, dir: String): DataFrame = {
    val units = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").as("u"))
      .agg(expr("CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT))" +
        " AS BIGINT)").as("x"))
      .join(Tables.nation(spark, dir).selectExpr("n_nationkey AS u"),
        Seq("u"), "right")
      .selectExpr("u", "coalesce(x, CAST(0 AS BIGINT)) AS x")
    val nk = Tables.nation(spark, dir)
      .selectExpr("n_nationkey AS k", "n_regionkey AS r")
    val adj = nk.as("a").join(nk.selectExpr("k AS k2", "r AS r2").as("b"),
      expr("a.r = b.r2 AND a.k <> b.k2"))
      .selectExpr("a.k AS ui", "b.k2 AS uj")
    giStar(units, adj).withColumnRenamed("u", "n_nationkey")
  }

  /** DuckDB twin: identical integer forms, one shared chain, flag on
    * the rounded z. */
  val nationBalanceGiStarSql: String =
    """WITH units AS (
      |  SELECT n.n_nationkey AS u,
      |    coalesce(CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT))
      |      AS BIGINT), 0) AS x
      |  FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS t,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
      |  FROM units),
      |adj AS (
      |  SELECT a.n_nationkey AS ui, b.n_nationkey AS uj
      |  FROM nation a JOIN nation b
      |    ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey),
      |closed AS (
      |  SELECT ui, uj FROM adj
      |  UNION ALL
      |  SELECT u AS ui, u AS uj FROM units),
      |hood AS (
      |  SELECT ui AS u, CAST(sum(x) AS BIGINT) AS b,
      |    CAST(count(*) AS BIGINT) AS w_i
      |  FROM closed JOIN units ON units.u = closed.uj
      |  GROUP BY 1),
      |forms AS (
      |  SELECT hood.u, w_i,
      |    CAST(n AS HUGEINT) * b - CAST(w_i AS HUGEINT) * t AS num,
      |    CAST(n AS HUGEINT) * q - CAST(t AS HUGEINT) * t AS vq,
      |    n * w_i - w_i * w_i AS vw, n
      |  FROM hood CROSS JOIN tot),
      |zs AS (
      |  SELECT u, w_i,
      |    round(CAST(num AS DOUBLE) / nullif(sqrt(CAST(vq AS DOUBLE)
      |      * CAST(vw AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)), 0.0), 6)
      |      + 0.0 AS gi_z
      |  FROM forms)
      |SELECT u AS n_nationkey, w_i, gi_z,
      |  CASE WHEN gi_z > 1.96 THEN 1 WHEN gi_z < -1.96 THEN -1
      |    ELSE 0 END AS hot
      |FROM zs""".stripMargin
}
