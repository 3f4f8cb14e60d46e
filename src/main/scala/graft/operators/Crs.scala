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

  /** Double → SQL literal both engines parse to the identical double
    * (shortest round-trip repr). E-notation values (the tiny TM series
    * coefficients, ~1e-9) go through a string→DOUBLE cast: both
    * engines' strtod is correctly rounded, and a plain-decimal
    * expansion would overflow Spark's 38-digit decimal literal. */
  private[operators] def lit(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.contains("E")) s"CAST('$s' AS DOUBLE)"
    else if (d < 0) s"($s)" else s
  }

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

  // ======================================================================
  // r11 (r10 verdict #8): the two CRS pairs a geo user asks for next —
  // Web Mercator (EPSG:3857) and a UTM zone (Transverse Mercator).
  // Same discipline as the LCC pair: closed-form Snyder math generated
  // ONCE as SQL text, evaluated by both engines.
  // ======================================================================

  /** EPSG:3857 Web Mercator — the spherical Mercator every web tile
    * stack serves (Snyder eqs 7-1/7-2 and 7-4/7-5 with R = WGS84
    * semi-major). Exact closed forms both ways; the published frame
    * half-width R·π = 20037508.342789244 m pins the constants
    * (CrsSpec). */
  object WebMercator {
    val R = 6378137.0
    def xSql(lonDeg: String): String = s"${lit(R)} * radians($lonDeg)"
    def ySql(latDeg: String): String =
      s"${lit(R)} * ln(tan(pi()/4 + radians($latDeg)/2))"
    def lonSql(x: String): String = s"degrees(($x) / ${lit(R)})"
    def latSql(y: String): String =
      s"degrees(2 * atan(exp(($y) / ${lit(R)})) - pi()/2)"
  }

  /** Transverse Mercator (ellipsoid, Snyder eqs 8-9…8-25 — the UTM
    * projection) as SQL-fragment generators over named intermediate
    * columns, like [[LccParams]]. Series accuracy within a UTM zone is
    * sub-millimeter; the round trip closes to ~1e-9 degrees (CrsSpec).
    * `lonODeg` is the zone central meridian (UTM zone z north:
    * lon0 = 6z − 183, k0 = 0.9996, FE = 500 km, FN = 0). */
  final case class TmParams(a: Double, invF: Double, lonODeg: Double,
      k0: Double, falseE: Double, falseN: Double) {
    val e2: Double = { val f = 1.0 / invF; 2 * f - f * f }
    val ep2: Double = e2 / (1 - e2)
    val lon0: Double = math.toRadians(lonODeg)
    private val e4 = e2 * e2
    private val e6 = e4 * e2
    val cM0: Double = 1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256
    val cM2: Double = 3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024
    val cM4: Double = 15 * e4 / 256 + 45 * e6 / 1024
    val cM6: Double = 35 * e6 / 3072
    val e1: Double = {
      val s = math.sqrt(1 - e2); (1 - s) / (1 + s)
    }
    val cP2: Double = 3 * e1 / 2 - 27 * math.pow(e1, 3) / 32
    val cP4: Double = 21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32
    val cP6: Double = 151 * math.pow(e1, 3) / 96
    val cP8: Double = 1097 * math.pow(e1, 4) / 512

    /** Meridian arc M(φ) (Snyder 3-21). `lat` is a radians column. */
    def mSql(lat: String): String =
      s"${lit(a)} * (${lit(cM0)} * ($lat) - ${lit(cM2)} * sin(2*($lat))" +
        s" + ${lit(cM4)} * sin(4*($lat)) - ${lit(cM6)} * sin(6*($lat)))"

    // ---- forward (lat/lon radians → easting/northing), 8-9…8-13 ----
    def nSql(lat: String): String =
      s"${lit(a)} / sqrt(1 - ${lit(e2)} * sin($lat) * sin($lat))"
    def tSql(lat: String): String = s"tan($lat) * tan($lat)"
    def cSql(lat: String): String = s"${lit(ep2)} * cos($lat) * cos($lat)"
    def aaSql(lat: String, lon: String): String =
      s"(($lon) - ${lit(lon0)}) * cos($lat)"
    /** Easting from columns n/t/c/aa (materialize the fragments above
      * under those names first). */
    def eastingSql(n: String, t: String, c: String, aa: String): String =
      s"${lit(falseE)} + ${lit(k0)} * ($n) * (($aa)" +
        s" + (1 - ($t) + ($c)) * power($aa, 3) / 6" +
        s" + (5 - 18*($t) + ($t)*($t) + 72*($c) - ${lit(58 * ep2)})" +
        s" * power($aa, 5) / 120)"
    def northingSql(n: String, t: String, c: String, aa: String,
        m: String, lat: String): String =
      s"${lit(falseN)} + ${lit(k0)} * (($m) + ($n) * tan($lat) * (($aa)*($aa)/2" +
        s" + (5 - ($t) + 9*($c) + 4*($c)*($c)) * power($aa, 4) / 24" +
        s" + (61 - 58*($t) + ($t)*($t) + 600*($c) - ${lit(330 * ep2)})" +
        s" * power($aa, 6) / 720))"

    // ---- inverse (easting/northing → lat/lon), 8-18…8-25 ----
    def muSql(nn: String): String =
      s"((($nn) - ${lit(falseN)}) / ${lit(k0)}) / ${lit(a * cM0)}"
    /** Footpoint latitude φ1 from the rectifying latitude column μ. */
    def phi1Sql(mu: String): String =
      s"($mu) + ${lit(cP2)} * sin(2*($mu)) + ${lit(cP4)} * sin(4*($mu))" +
        s" + ${lit(cP6)} * sin(6*($mu)) + ${lit(cP8)} * sin(8*($mu))"
    def r1Sql(p1: String): String =
      s"${lit(a * (1 - e2))} / power(1 - ${lit(e2)} * sin($p1) * sin($p1), 1.5)"
    def dSql(en: String, n1: String): String =
      s"(($en) - ${lit(falseE)}) / (($n1) * ${lit(k0)})"
    /** Latitude in DEGREES from columns φ1/c1/t1/n1/r1/d (use
      * [[cSql]]/[[tSql]]/[[nSql]] on φ1 for c1/t1/n1). */
    def latSql(p1: String, c1: String, t1: String, n1: String,
        r1: String, d: String): String =
      s"degrees(($p1) - (($n1) * tan($p1) / ($r1)) * (($d)*($d)/2" +
        s" - (5 + 3*($t1) + 10*($c1) - 4*($c1)*($c1) - ${lit(9 * ep2)})" +
        s" * power($d, 4) / 24" +
        s" + (61 + 90*($t1) + 298*($c1) + 45*($t1)*($t1)" +
        s" - ${lit(252 * ep2)} - 3*($c1)*($c1)) * power($d, 6) / 720))"
    def lonDegSql(p1: String, c1: String, t1: String, d: String): String =
      s"degrees(${lit(lon0)} + (($d) - (1 + 2*($t1) + ($c1)) * power($d, 3) / 6" +
        s" + (5 - 2*($c1) + 28*($t1) - 3*($c1)*($c1) + ${lit(8 * ep2)}" +
        s" + 24*($t1)*($t1)) * power($d, 5) / 120) / cos($p1))"
  }

  /** UTM zone 19 north on WGS84 — the zone covering the reference's
    * Massachusetts geography (EPSG:32619). */
  val Utm19N: TmParams = TmParams(
    a = 6378137.0, invF = 298.257223563, lonODeg = -69.0,
    k0 = 0.9996, falseE = 500000.0, falseN = 0.0)

  // ---- q146: UTM + Web Mercator forward/inverse with round-trips ----

  /** Deterministic in-zone geographic points per customer: lon within
    * ±2.5° of the zone-19 central meridian, mid-northern latitudes
    * (integer-valued millidegrees — engine-identical input doubles). */
  private val LonExpr =
    "CAST(-71500 + (c_custkey * 41) % 5001 AS DOUBLE) / 1e3"
  private val LatExpr =
    "CAST(36000 + (c_custkey * 29) % 12001 AS DOUBLE) / 1e3"

  /** q146: forward-project each point to UTM 19N and Web Mercator,
    * then re-invert BOTH (unrounded intermediates, q54 discipline) —
    * one oracle-checked query exercising all four new transforms;
    * round trips reproduce the inputs far inside the round(,4)
    * quantum. Pure per-row projection — zero shuffles at any scale. */
  def utmWebmerc(spark: SparkSession, dir: String): DataFrame = {
    val p = Utm19N
    val wm = WebMercator
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        expr(LonExpr).as("lon"), expr(LatExpr).as("lat"))
      .withColumn("latr", expr("radians(lat)"))
      .withColumn("lonr", expr("radians(lon)"))
      .withColumn("n", expr(p.nSql("latr")))
      .withColumn("t", expr(p.tSql("latr")))
      .withColumn("c", expr(p.cSql("latr")))
      .withColumn("aa", expr(p.aaSql("latr", "lonr")))
      .withColumn("m", expr(p.mSql("latr")))
      .withColumn("utm_e", expr(p.eastingSql("n", "t", "c", "aa")))
      .withColumn("utm_n", expr(p.northingSql("n", "t", "c", "aa", "m", "latr")))
      .withColumn("mu", expr(p.muSql("utm_n")))
      .withColumn("p1", expr(p.phi1Sql("mu")))
      .withColumn("c1", expr(p.cSql("p1")))
      .withColumn("t1", expr(p.tSql("p1")))
      .withColumn("n1", expr(p.nSql("p1")))
      .withColumn("r1", expr(p.r1Sql("p1")))
      .withColumn("d", expr(p.dSql("utm_e", "n1")))
      .withColumn("wm_x", expr(wm.xSql("lon")))
      .withColumn("wm_y", expr(wm.ySql("lat")))
      .select(col("c_custkey"), col("lon"), col("lat"),
        expr("round(utm_e, 4) + 0.0").as("utm_e"),
        expr("round(utm_n, 4) + 0.0").as("utm_n"),
        expr(s"round(${p.latSql("p1", "c1", "t1", "n1", "r1", "d")}, 4) + 0.0")
          .as("utm_rt_lat"),
        expr(s"round(${p.lonDegSql("p1", "c1", "t1", "d")}, 4) + 0.0")
          .as("utm_rt_lon"),
        expr("round(wm_x, 4) + 0.0").as("wm_x"),
        expr("round(wm_y, 4) + 0.0").as("wm_y"),
        expr(s"round(${wm.latSql("wm_y")}, 4) + 0.0").as("wm_rt_lat"),
        expr(s"round(${wm.lonSql("wm_x")}, 4) + 0.0").as("wm_rt_lon"))
  }

  /** DuckDB twin: the IDENTICAL SQL fragments chained through CTEs. */
  val utmWebmercSql: String = {
    val p = Utm19N
    val wm = WebMercator
    s"""WITH pts AS (
       |  SELECT c_custkey, $LonExpr AS lon, $LatExpr AS lat
       |  FROM customer),
       |rad AS (SELECT *, radians(lat) AS latr, radians(lon) AS lonr FROM pts),
       |fw1 AS (SELECT *, ${p.nSql("latr")} AS n, ${p.tSql("latr")} AS t,
       |  ${p.cSql("latr")} AS c, ${p.aaSql("latr", "lonr")} AS aa,
       |  ${p.mSql("latr")} AS m FROM rad),
       |fw2 AS (SELECT *, ${p.eastingSql("n", "t", "c", "aa")} AS utm_e,
       |  ${p.northingSql("n", "t", "c", "aa", "m", "latr")} AS utm_n
       |  FROM fw1),
       |iv1 AS (SELECT *, ${p.muSql("utm_n")} AS mu FROM fw2),
       |iv2 AS (SELECT *, ${p.phi1Sql("mu")} AS p1 FROM iv1),
       |iv3 AS (SELECT *, ${p.cSql("p1")} AS c1, ${p.tSql("p1")} AS t1,
       |  ${p.nSql("p1")} AS n1, ${p.r1Sql("p1")} AS r1 FROM iv2),
       |iv4 AS (SELECT *, ${p.dSql("utm_e", "n1")} AS d FROM iv3),
       |mrc AS (SELECT *, ${wm.xSql("lon")} AS wm_x, ${wm.ySql("lat")} AS wm_y
       |  FROM iv4)
       |SELECT c_custkey, lon, lat,
       |  round(utm_e, 4) + 0.0 AS utm_e,
       |  round(utm_n, 4) + 0.0 AS utm_n,
       |  round(${p.latSql("p1", "c1", "t1", "n1", "r1", "d")}, 4) + 0.0 AS utm_rt_lat,
       |  round(${p.lonDegSql("p1", "c1", "t1", "d")}, 4) + 0.0 AS utm_rt_lon,
       |  round(wm_x, 4) + 0.0 AS wm_x,
       |  round(wm_y, 4) + 0.0 AS wm_y,
       |  round(${wm.latSql("wm_y")}, 4) + 0.0 AS wm_rt_lat,
       |  round(${wm.lonSql("wm_x")}, 4) + 0.0 AS wm_rt_lon
       |FROM mrc""".stripMargin
  }
}
