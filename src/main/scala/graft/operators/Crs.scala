package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Coordinate-reference-system reprojection (the reference's
  * `to_crs(epsg=4326)` step, dags/district_gis_etl.py:67: Massachusetts
  * State Plane → geographic lon/lat) as pure closed-form Catalyst
  * expressions — no geodesy library, no UDFs.
  *
  * The projection is the Lambert Conformal Conic (2 standard parallels)
  * on an ellipsoid — the public closed-form math of Snyder, "Map
  * Projections: A Working Manual" (USGS PP 1395, 1987), eqs. 14-15/15-1
  * …15-11, which is also what EPSG:26986 (NAD83 / Massachusetts
  * Mainland, GRS80 ellipsoid) specifies. Forward (lat/lon → easting/
  * northing) is direct; inverse latitude needs the standard fixed-point
  * iteration φ ← π/2 − 2·atan(t′·((1−e·sinφ)/(1+e·sinφ))^(e/2)), which
  * converges superlinearly (contraction ~e²/2 ≈ 0.003 per step), so
  * [[PhiIters]] unrolled steps reach double precision — a fixed-depth
  * expression, not a loop.
  *
  * Cross-engine exactness: every formula is generated ONCE as a SQL
  * text fragment with all projection constants embedded as JVM-double
  * literals (shortest round-trip repr — both engines parse decimal
  * literals to the same nearest double). Spark evaluates the fragment
  * via `expr(...)`, the DuckDB oracle embeds the identical text, so the
  * two engines run the same arithmetic in the same order; the only
  * residual divergence is last-ulp libm differences in sin/atan/power,
  * absorbed by the house round(x,4)+0.0 output convention. Plan shape:
  * pure per-row projection — zero shuffles at any scale.
  */
object Crs {

  /** Lambert Conformal Conic (2SP) parameter set. Angles in degrees.
    * `lat1Deg`/`lat2Deg` are the standard parallels; `latODeg`/`lonODeg`
    * the false origin; `falseE`/`falseN` in meters. */
  final case class LccParams(
      a: Double, invF: Double,
      latODeg: Double, lat1Deg: Double, lat2Deg: Double, lonODeg: Double,
      falseE: Double, falseN: Double) {

    val e2: Double = { val f = 1.0 / invF; 2 * f - f * f }
    val e: Double = math.sqrt(e2)
    private val lat0 = math.toRadians(latODeg)
    private val lat1 = math.toRadians(lat1Deg)
    private val lat2 = math.toRadians(lat2Deg)
    val lon0: Double = math.toRadians(lonODeg)

    private def mOf(p: Double) =
      math.cos(p) / math.sqrt(1 - e2 * math.sin(p) * math.sin(p))
    private def tOf(p: Double) =
      math.tan(math.Pi / 4 - p / 2) /
        math.pow((1 - e * math.sin(p)) / (1 + e * math.sin(p)), e / 2)

    /** Cone constant n, scale F, origin radius ρ0 (Snyder 15-3…15-7a).
      * n > 0 for northern-hemisphere parallels — the inverse below
      * assumes that (ρ′ taken positive). */
    val coneN: Double =
      (math.log(mOf(lat1)) - math.log(mOf(lat2))) / (math.log(tOf(lat1)) - math.log(tOf(lat2)))
    val coneF: Double = mOf(lat1) / (coneN * math.pow(tOf(lat1), coneN))
    val rho0: Double = a * coneF * math.pow(tOf(lat0), coneN)

    /** Double → SQL literal both engines parse to the identical double.
      * Java's shortest round-trip repr; E-notation (which both parsers
      * accept) falls back to the exact plain decimal expansion. */
    private def c(d: Double): String = {
      val s = java.lang.Double.toString(d)
      if (s.contains("E")) s"(${new java.math.BigDecimal(d).toPlainString})"
      else if (d < 0) s"($s)" else s
    }

    // ---- inverse (easting/northing → lon/lat), Snyder 15-10/15-11/7-9 ----

    def rhoPrimeSql(en: String, nn: String): String =
      s"sqrt(power(($en) - ${c(falseE)}, 2) + power(${c(rho0)} - (($nn) - ${c(falseN)}), 2))"
    def tPrimeSql(en: String, nn: String): String =
      s"power(${rhoPrimeSql(en, nn)} / ${c(a * coneF)}, ${c(1.0 / coneN)})"
    /** Longitude in DEGREES from easting/northing columns. */
    def lonSql(en: String, nn: String): String =
      s"degrees(atan2(($en) - ${c(falseE)}, ${c(rho0)} - (($nn) - ${c(falseN)})) / ${c(coneN)} + ${c(lon0)})"
    /** Iteration seed φ0 = π/2 − 2·atan(t′) (the sphere solution). */
    def phiSeedSql(tp: String): String = s"pi()/2 - 2*atan($tp)"
    /** One fixed-point step of the ellipsoidal latitude iteration. */
    def phiStepSql(tp: String, phi: String): String =
      s"pi()/2 - 2*atan(($tp) * power((1 - ${c(e)}*sin($phi)) / (1 + ${c(e)}*sin($phi)), ${c(e / 2)}))"

    // ---- forward (lat/lon radians → easting/northing), Snyder 15-1/15-2 ----

    def tSql(latRad: String): String =
      s"tan(pi()/4 - ($latRad)/2) / power((1 - ${c(e)}*sin($latRad)) / (1 + ${c(e)}*sin($latRad)), ${c(e / 2)})"
    def rhoSql(t: String): String = s"${c(a * coneF)} * power($t, ${c(coneN)})"
    def eastingSql(rho: String, lonRad: String): String =
      s"${c(falseE)} + ($rho) * sin(${c(coneN)} * (($lonRad) - ${c(lon0)}))"
    def northingSql(rho: String, lonRad: String): String =
      s"${c(falseN)} + ${c(rho0)} - ($rho) * cos(${c(coneN)} * (($lonRad) - ${c(lon0)}))"
  }

  /** Fixed-point steps for the inverse latitude. Contraction is ~3e-3
    * per step from a seed already within ~3e-3 rad, so 6 steps land at
    * ~1e-18 — beyond double precision; fixed depth keeps the unrolled
    * expression identical on both engines. */
  val PhiIters = 6

  /** EPSG:26986 — NAD83 / Massachusetts Mainland (GRS80): the CRS the
    * reference's shapefiles arrive in (district_gis_etl.py:67). */
  val MassMainland: LccParams = LccParams(
    a = 6378137.0, invF = 298.257222101,
    latODeg = 41.0, lat1Deg = 41.0 + 43.0 / 60.0, lat2Deg = 42.0 + 41.0 / 60.0,
    lonODeg = -71.5, falseE = 200000.0, falseN = 750000.0)

  // ---- q54: reproject state-plane points to lon/lat, with round-trip ----

  /** Deterministic state-plane coordinates derived from `customer` (the
    * house synthetic-input technique — integer-valued, so the input
    * doubles are engine-identical). */
  private val EastingExpr = "CAST(50000 + (c_custkey * 37) % 300001 AS DOUBLE)"
  private val NorthingExpr = "CAST(700000 + (c_custkey * 53) % 250001 AS DOUBLE)"

  /** q54: EPSG:26986 → lon/lat for a synthetic point per customer, plus
    * the FORWARD re-projection of the (unrounded) result — so one
    * oracle-checked query exercises inverse AND forward: the round trip
    * reproduces the integer easting/northing to ~1e-8 m, far inside the
    * round(,4) quantum, on both engines. */
  def reproject(spark: SparkSession, dir: String): DataFrame = {
    val p = MassMainland
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey"),
        expr(EastingExpr).as("easting"),
        expr(NorthingExpr).as("northing"))
      .withColumn("tp", expr(p.tPrimeSql("easting", "northing")))
      .withColumn("phi", expr(p.phiSeedSql("tp")))
    val iterated = (1 to PhiIters).foldLeft(base) { (d, _) =>
      d.withColumn("phi", expr(p.phiStepSql("tp", "phi")))
    }
    iterated
      .withColumn("lon_rad", expr(
        s"radians(${p.lonSql("easting", "northing")})"))
      .withColumn("rho", expr(p.rhoSql(p.tSql("phi"))))
      .select(col("c_custkey"), col("easting"), col("northing"),
        expr(s"round(${p.lonSql("easting", "northing")}, 4) + 0.0").as("lon"),
        expr("round(degrees(phi), 4) + 0.0").as("lat"),
        expr(s"round(${p.eastingSql("rho", "lon_rad")}, 4) + 0.0").as("rt_easting"),
        expr(s"round(${p.northingSql("rho", "lon_rad")}, 4) + 0.0").as("rt_northing"))
  }

  /** DuckDB twin: the IDENTICAL SQL fragments, iteration unrolled as a
    * chain of CTEs re-selecting `phi`. */
  val reprojectSql: String = {
    val p = MassMainland
    val steps = (1 to PhiIters).map { i =>
      s"p$i AS (SELECT c_custkey, easting, northing, tp, ${p.phiStepSql("tp", "phi")} AS phi FROM p${i - 1})"
    }.mkString(",\n")
    s"""WITH en AS (
       |  SELECT c_custkey, $EastingExpr AS easting, $NorthingExpr AS northing
       |  FROM customer),
       |tpc AS (SELECT c_custkey, easting, northing,
       |  ${p.tPrimeSql("easting", "northing")} AS tp FROM en),
       |p0 AS (SELECT c_custkey, easting, northing, tp,
       |  ${p.phiSeedSql("tp")} AS phi FROM tpc),
       |$steps,
       |fwd AS (SELECT c_custkey, easting, northing, phi,
       |  radians(${p.lonSql("easting", "northing")}) AS lon_rad,
       |  ${p.rhoSql(p.tSql("phi"))} AS rho
       |FROM p$PhiIters)
       |SELECT c_custkey, easting, northing,
       |  round(${p.lonSql("easting", "northing")}, 4) + 0.0 AS lon,
       |  round(degrees(phi), 4) + 0.0 AS lat,
       |  round(${p.eastingSql("rho", "lon_rad")}, 4) + 0.0 AS rt_easting,
       |  round(${p.northingSql("rho", "lon_rad")}, 4) + 0.0 AS rt_northing
       |FROM fwd""".stripMargin
  }
}
