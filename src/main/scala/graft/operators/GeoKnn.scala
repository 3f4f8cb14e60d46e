package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Nearest-neighbor-within-radius geo join — for each left point, the
  * closest right point by haversine distance among those within
  * `radiusKm`, via GRID-BUCKETED candidate generation: left points
  * probe their cell plus the 8 neighbors, right points sit in their
  * own cell, and the cell size is chosen ≥ the radius in degrees so
  * the 3×3 ring PROVABLY contains every within-radius candidate —
  * exact semantics, never an all-pairs join. The "nearest depot /
  * store / sensor to each customer" workhorse.
  *
  * Exactness/determinism: coordinates are exact integer MICRODEGREES;
  * cells come from integer division on shifted-nonnegative values
  * (shared floor semantics both engines — Spark `div` truncates
  * toward zero, so the shift is load-bearing for negative
  * coordinates); the haversine is ONE shared-text double chain over
  * the exact integers (identical IEEE ops ⇒ identical ordering), and
  * the winner per left point is row_number over (distance, right
  * key) — key-tie-broken, deterministic. Antimeridian wrap is out of
  * contract (documented): cells don't wrap at ±180°.
  *
  * Plan/scale: left explodes ×9 on cell offsets, the join keys on the
  * cell — candidate fan-out is bounded by cell density, suppliers are
  * never replicated; per-left windows run over the candidate lists
  * (density-bounded). At 100 TB this is the standard distance-join
  * shape; skew = densest cell, the documented knob being cell size. */
object GeoKnn {

  val EarthKm = 6371.0088

  /** Haversine km between microdegree coordinate columns (shared
    * text). */
  private def havKm(lat1: String, lon1: String, lat2: String,
      lon2: String): String = {
    def rad(c: String) = s"CAST($c AS DOUBLE) / 1e6 * pi() / 180e0"
    s"2e0 * $EarthKm * asin(sqrt(" +
      s"pow(sin((${rad(lat2)} - ${rad(lat1)}) / 2e0), 2) + " +
      s"cos(${rad(lat1)}) * cos(${rad(lat2)}) * " +
      s"pow(sin((${rad(lon2)} - ${rad(lon1)}) / 2e0), 2)))"
  }

  /** Nearest right point within `radiusKm` of each left point.
    * Frames carry (keyCol, latMicro, lonMicro) with exact integer
    * microdegrees. `cellMicro` must make one cell ≥ radiusKm of
    * longitude at the highest |latitude| in the data — the caller's
    * documented precondition (checked for latitude, which is
    * uniform). Returns (left key, right key, dist_km, n_cand). */
  def nearestWithin(left: DataFrame, right: DataFrame, radiusKm: Double,
      cellMicro: Long): DataFrame = {
    require(cellMicro / 1e6 * 111.045 >= radiusKm,
      s"cell ($cellMicro micro-deg) narrower than radius $radiusKm km")
    def cells(df: DataFrame) = df
      .withColumn("cla", expr(s"(lat + 90000000L) div ${cellMicro}L"))
      .withColumn("clo", expr(s"(lon + 180000000L) div ${cellMicro}L"))
    val r = cells(right)
      .selectExpr("k AS rk", "lat AS rlat", "lon AS rlon", "cla", "clo")
    val l9 = cells(left)
      .selectExpr("k AS lk", "lat AS llat", "lon AS llon", "cla", "clo")
      .withColumn("dla", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dlo", explode(array(lit(-1L), lit(0L), lit(1L))))
      .selectExpr("lk", "llat", "llon",
        "cla + dla AS cla", "clo + dlo AS clo")
    val cand = l9.join(r, Seq("cla", "clo"))
      .withColumn("dist", expr(havKm("llat", "llon", "rlat", "rlon")))
      .filter(col("dist") <= radiusKm)
    val w = Window.partitionBy("lk").orderBy(col("dist"), col("rk"))
    cand
      .withColumn("rn", row_number().over(w))
      .withColumn("n_cand", count(lit(1)).over(Window.partitionBy("lk")))
      .filter(col("rn") === 1)
      .selectExpr("lk", "rk", "round(dist, 3) + 0.0 AS dist_km",
        "CAST(n_cand AS BIGINT) AS n_cand")
  }

  val RadiusKm = 500.0
  val CellMicro = 6000000L // 6 degrees >= 500 km at |lat| <= 40

  /** Deterministic synthetic coordinates from a key (the q33
    * convention): latitude ±40°, longitude ±170° in exact
    * microdegrees — clear of both poles and the antimeridian. */
  private def coords(keyExpr: String, mLat: Long, mLon: Long)
      : (String, String) = (
    s"CAST(($keyExpr * ${mLat}L) % 80000000L - 40000000L AS BIGINT)",
    s"CAST(($keyExpr * ${mLon}L) % 340000000L - 170000000L AS BIGINT)")

  /** q122: nearest supplier within 500 km of each customer, on
    * key-derived coordinates. */
  def customerNearestSupplier(spark: SparkSession, dir: String): DataFrame = {
    val (clat, clon) = coords("c_custkey", 7919L, 104729L)
    val (slat, slon) = coords("s_suppkey", 15485863L, 32452843L)
    nearestWithin(
      Tables.customer(spark, dir)
        .selectExpr("c_custkey AS k", s"$clat AS lat", s"$clon AS lon"),
      Tables.supplier(spark, dir)
        .selectExpr("s_suppkey AS k", s"$slat AS lat", s"$slon AS lon"),
      RadiusKm, CellMicro)
      .selectExpr("lk AS c_custkey", "rk AS s_suppkey", "dist_km", "n_cand")
  }

  val customerNearestSupplierSql: String = {
    val hav = havKm("llat", "llon", "rlat", "rlon")
    s"""WITH cust AS (
       |  SELECT c_custkey AS lk,
       |    CAST((c_custkey * 7919) % 80000000 - 40000000 AS BIGINT) AS llat,
       |    CAST((c_custkey * 104729) % 340000000 - 170000000 AS BIGINT) AS llon
       |  FROM customer),
       |supp AS (
       |  SELECT s_suppkey AS rk,
       |    CAST((s_suppkey * 15485863) % 80000000 - 40000000 AS BIGINT) AS rlat,
       |    CAST((s_suppkey * 32452843) % 340000000 - 170000000 AS BIGINT) AS rlon
       |  FROM supplier),
       |rc AS (
       |  SELECT rk, rlat, rlon,
       |    (rlat + 90000000) // 6000000 AS cla,
       |    (rlon + 180000000) // 6000000 AS clo
       |  FROM supp),
       |l9 AS (
       |  SELECT lk, llat, llon,
       |    (llat + 90000000) // 6000000 + dla AS cla,
       |    (llon + 180000000) // 6000000 + dlo AS clo
       |  FROM cust
       |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dla)
       |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dlo)),
       |cand AS (
       |  SELECT lk, rk, $hav AS dist
       |  FROM l9 JOIN rc USING (cla, clo)),
       |hits AS (SELECT * FROM cand WHERE dist <= 500.0),
       |ranked AS (
       |  SELECT lk, rk, dist,
       |    row_number() OVER (PARTITION BY lk ORDER BY dist, rk) AS rn,
       |    count(*) OVER (PARTITION BY lk) AS n_cand
       |  FROM hits)
       |SELECT lk AS c_custkey, rk AS s_suppkey,
       |  round(dist, 3) + 0.0 AS dist_km,
       |  CAST(n_cand AS BIGINT) AS n_cand
       |FROM ranked WHERE rn = 1""".stripMargin
  }
}
