package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Geometric median (Weiszfeld) — the ROBUST center the geo deck
  * lacks: a centroid (mean point) chases outliers, so one mis-geocoded
  * customer drags a nation's "center of mass" into the ocean; the
  * geometric median minimizes the MEAN DISTANCE to all points and has
  * the same ~50% breakdown robustness q71's univariate median has —
  * the facility-location answer ("where should the depot go?").
  *
  * Algorithm: [[Iters]] Weiszfeld steps from the integer centroid,
  *
  *   c' = Σ(xᵢ/dᵢ) / Σ(1/dᵢ),   dᵢ = ‖xᵢ − c‖  (planar microdegrees)
  *
  * with the state SNAPPED to integer microdegrees after every step —
  * integer state in, one shared-text double chain per row, 1e-6/1e-12
  * floored weight sums (order-free DECIMAL(38,0)), integer floor
  * division out. Determinism is by construction in both engines; the
  * iteration count is the documented truncation knob (Weiszfeld
  * converges linearly; three steps from the centroid land within a
  * few microdegrees on non-adversarial clouds, and the audit columns
  * REPORT the achieved objective rather than assuming convergence).
  * Coordinates are shifted non-negative before any floor division
  * (trunc-vs-floor never meets a negative operand — the q300 lesson).
  *
  * Plan/scale: the point frame is scanned once per iteration
  * ([[Iters]] + 2 keyed aggregates total, each map-side combined)
  * with the current centers broadcast back — the q8/q284 two-pass
  * class, iterated a constant number of times. No windows, no joins
  * beyond dimension-grade broadcasts. */
object GeoMedian {

  val Iters = 3
  /** Non-negative shifts (the registered coordinate ranges). */
  val LatShift = 40000000L
  val LonShift = 170000000L

  private val DSql =
    "sqrt((CAST(x AS DOUBLE) - CAST(cx AS DOUBLE))" +
      " * (CAST(x AS DOUBLE) - CAST(cx AS DOUBLE))" +
      " + (CAST(y AS DOUBLE) - CAST(cy AS DOUBLE))" +
      " * (CAST(y AS DOUBLE) - CAST(cy AS DOUBLE)))"
  /** Coincident-point guard: a point sitting ON the current center
    * gets weight 1 (d clamped to 1 microdegree). */
  private val WSql = s"(1.0 / (CASE WHEN $DSql < 1.0 THEN 1.0 ELSE $DSql END))"

  /** One Weiszfeld step: (g, cx, cy) from floored weight sums. */
  private def stepAgg(pts: DataFrame, centers: DataFrame): DataFrame =
    pts.join(broadcast(centers), "g")
      .selectExpr("g",
        s"CAST(floor($WSql * 1e12) AS DECIMAL(38,0)) AS w_i",
        s"CAST(floor($WSql * CAST(x AS DOUBLE) * 1e6) AS DECIMAL(38,0)) AS wx_i",
        s"CAST(floor($WSql * CAST(y AS DOUBLE) * 1e6) AS DECIMAL(38,0)) AS wy_i")
      .groupBy("g")
      .agg(
        expr("CAST(sum(w_i) AS DECIMAL(38,0))").as("sw"),
        expr("CAST(sum(wx_i) AS DECIMAL(38,0))").as("swx"),
        expr("CAST(sum(wy_i) AS DECIMAL(38,0))").as("swy"))
      .selectExpr("g",
        "CAST(swx * 1000000 div sw AS BIGINT) AS cx",
        "CAST(swy * 1000000 div sw AS BIGINT) AS cy")

  /** Mean distance (floored-microdegree sum) from a center frame. */
  private def meanDist(pts: DataFrame, centers: DataFrame,
      as: String): DataFrame =
    pts.join(broadcast(centers), "g")
      .groupBy("g")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as(s"n_$as"),
        expr(s"CAST(sum(CAST(floor($DSql) AS BIGINT)) AS DECIMAL(38,0))")
          .as(s"sd_$as"))
      .selectExpr("g", s"n_$as",
        s"CAST(sd_$as div n_$as AS BIGINT) AS dist_$as")

  /** Geometric median per group from (g, x, y) — SHIFTED non-negative
    * integer coordinates. Returns (g, n_pts, med_x, med_y,
    * mean_dist_centroid, mean_dist_median) in the same shifted units
    * (callers un-shift for display). */
  def geometricMedian(pts0: DataFrame): DataFrame = {
    val pts = pts0.filter(col("x").isNotNull && col("y").isNotNull)
      .localCheckpoint(true) // centroid + Iters steps + two audits
    val centroid = pts.groupBy("g")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n"),
        expr("CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("sx"),
        expr("CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("sy"))
      .selectExpr("g", "CAST(sx div n AS BIGINT) AS cx",
        "CAST(sy div n AS BIGINT) AS cy")
    val med = (1 to Iters).foldLeft(centroid)((c, _) => stepAgg(pts, c))
    meanDist(pts, centroid, "c")
      .join(meanDist(pts, med, "m"), "g")
      .join(med, "g")
      .selectExpr("g", "n_c AS n_pts", "cx AS med_x", "cy AS med_y",
        "dist_c AS mean_dist_centroid", "dist_m AS mean_dist_median")
  }

  /** q307: the robust service center of each nation's customer cloud
    * (the q122 synthetic microdegree coordinates — provenance in
    * GeoKnn's scaladoc). */
  def nationCustomerMedian(spark: SparkSession, dir: String): DataFrame =
    geometricMedian(Tables.customer(spark, dir)
      .filter(col("c_custkey").isNotNull && col("c_nationkey").isNotNull)
      .selectExpr("c_nationkey AS g",
        s"CAST((c_custkey * 7919) % 80000000 - 40000000 + $LatShift AS BIGINT) AS x",
        s"CAST((c_custkey * 104729) % 340000000 - 170000000 + $LonShift AS BIGINT) AS y"))
      .withColumnRenamed("g", "c_nationkey")

  /** DuckDB twin: identical integer state, floored weights, floor
    * divisions — the three steps unrolled as CTEs. */
  val nationCustomerMedianSql: String = {
    val stepCtes = (1 to Iters).map { i =>
      s"""c$i AS (
         |  SELECT g,
         |    CAST(swx * 1000000 // sw AS BIGINT) AS cx,
         |    CAST(swy * 1000000 // sw AS BIGINT) AS cy
         |  FROM (
         |    SELECT g,
         |      CAST(sum(CAST(floor($WSql * 1e12) AS HUGEINT)) AS HUGEINT) AS sw,
         |      CAST(sum(CAST(floor($WSql * CAST(x AS DOUBLE) * 1e6) AS HUGEINT))
         |        AS HUGEINT) AS swx,
         |      CAST(sum(CAST(floor($WSql * CAST(y AS DOUBLE) * 1e6) AS HUGEINT))
         |        AS HUGEINT) AS swy
         |    FROM pts JOIN c${i - 1} USING (g) GROUP BY g))""".stripMargin
    }.mkString(",\n       |")
    s"""WITH pts AS (
       |  SELECT c_nationkey AS g,
       |    CAST((c_custkey * 7919) % 80000000 - 40000000 + $LatShift AS BIGINT) AS x,
       |    CAST((c_custkey * 104729) % 340000000 - 170000000 + $LonShift AS BIGINT) AS y
       |  FROM customer
       |  WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL),
       |c0 AS (
       |  SELECT g, CAST(sx // n AS BIGINT) AS cx, CAST(sy // n AS BIGINT) AS cy
       |  FROM (
       |    SELECT g, CAST(count(*) AS BIGINT) AS n,
       |      CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
       |      CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy
       |    FROM pts GROUP BY g)),
       |$stepCtes,
       |dc AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_c,
       |    CAST(CAST(sum(CAST(floor($DSql) AS BIGINT)) AS HUGEINT)
       |      // count(*) AS BIGINT) AS dist_c
       |  FROM pts JOIN c0 USING (g) GROUP BY g),
       |dm AS (
       |  SELECT g, CAST(CAST(sum(CAST(floor($DSql) AS BIGINT)) AS HUGEINT)
       |      // count(*) AS BIGINT) AS dist_m
       |  FROM pts JOIN c$Iters USING (g) GROUP BY g)
       |SELECT g AS c_nationkey, n_c AS n_pts,
       |  cx AS med_x, cy AS med_y,
       |  dist_c AS mean_dist_centroid, dist_m AS mean_dist_median
       |FROM dc JOIN dm USING (g) JOIN c$Iters USING (g)""".stripMargin
  }
}
