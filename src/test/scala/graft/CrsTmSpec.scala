package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Crs
import operators.Crs.{TmParams, Utm19N, WebMercator}

/** r11 CRS pairs (r10 verdict #8): Web Mercator + UTM. Anchors are
  * DEFINING, published properties of each projection — the EPSG:3857
  * frame half-width R·π = 20037508.342789244 m, an independent
  * y = R·atanh(sin φ) identity for the Mercator ordinate, UTM's
  * central-meridian invariants (easting = 500 000 exactly, scale
  * k0 = 0.9996, northing = k0·meridian arc), and forward∘inverse
  * closing far inside the verdict's 1e-6° bar. The SQL expression
  * path is checked against an independent plain-Scala transcription
  * of Snyder's formulas so fragment generation can't silently drift. */
class CrsTmSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  import spark.implicits._

  val p: TmParams = Utm19N

  // ---- independent scalar TM implementation (Snyder 8-9…8-25) ----
  private def mOf(phi: Double): Double =
    p.a * (p.cM0 * phi - p.cM2 * math.sin(2 * phi) +
      p.cM4 * math.sin(4 * phi) - p.cM6 * math.sin(6 * phi))
  private def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val n = p.a / math.sqrt(1 - p.e2 * math.sin(phi) * math.sin(phi))
    val t = math.tan(phi) * math.tan(phi)
    val c = p.ep2 * math.cos(phi) * math.cos(phi)
    val aa = (math.toRadians(lonDeg) - p.lon0) * math.cos(phi)
    val x = p.falseE + p.k0 * n * (aa + (1 - t + c) * math.pow(aa, 3) / 6 +
      (5 - 18 * t + t * t + 72 * c - 58 * p.ep2) * math.pow(aa, 5) / 120)
    val y = p.falseN + p.k0 * (mOf(phi) + n * math.tan(phi) * (aa * aa / 2 +
      (5 - t + 9 * c + 4 * c * c) * math.pow(aa, 4) / 24 +
      (61 - 58 * t + t * t + 600 * c - 330 * p.ep2) * math.pow(aa, 6) / 720))
    (x, y)
  }
  private def inverse(en: Double, nn: Double): (Double, Double) = {
    val mu = ((nn - p.falseN) / p.k0) / (p.a * p.cM0)
    val p1 = mu + p.cP2 * math.sin(2 * mu) + p.cP4 * math.sin(4 * mu) +
      p.cP6 * math.sin(6 * mu) + p.cP8 * math.sin(8 * mu)
    val c1 = p.ep2 * math.cos(p1) * math.cos(p1)
    val t1 = math.tan(p1) * math.tan(p1)
    val n1 = p.a / math.sqrt(1 - p.e2 * math.sin(p1) * math.sin(p1))
    val r1 = p.a * (1 - p.e2) /
      math.pow(1 - p.e2 * math.sin(p1) * math.sin(p1), 1.5)
    val d = (en - p.falseE) / (n1 * p.k0)
    val lat = p1 - (n1 * math.tan(p1) / r1) * (d * d / 2 -
      (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * p.ep2) * math.pow(d, 4) / 24 +
      (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * p.ep2 - 3 * c1 * c1) *
        math.pow(d, 6) / 720)
    val lon = p.lon0 + (d - (1 + 2 * t1 + c1) * math.pow(d, 3) / 6 +
      (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * p.ep2 + 24 * t1 * t1) *
        math.pow(d, 5) / 120) / math.cos(p1)
    (math.toDegrees(lat), math.toDegrees(lon))
  }

  test("web mercator: published frame constant and the atanh identity") {
    // the canonical EPSG:3857 half-width
    assert(math.abs(WebMercator.R * math.Pi - 20037508.342789244) < 1e-6)
    // y = R·ln(tan(π/4 + φ/2)) ≡ R·atanh(sin φ): two independent forms
    for (lat <- Seq(-75.0, -45.0, -10.0, 0.0, 10.0, 42.36, 60.0, 85.0)) {
      val viaTan = WebMercator.R *
        math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))
      val viaAtanh = {
        val s = math.sin(math.toRadians(lat))
        WebMercator.R * 0.5 * math.log((1 + s) / (1 - s))
      }
      assert(math.abs(viaTan - viaAtanh) < 1e-6, s"lat $lat")
    }
  }

  test("web mercator SQL path round-trips and matches the scalar form") {
    val pts = Seq((-71.06, 42.36), (-69.0, 36.0), (-66.5, 48.0), (0.0, 0.0),
      (179.9, -85.0)).toDF("lon", "lat")
    val out = pts
      .withColumn("x", expr(WebMercator.xSql("lon")))
      .withColumn("y", expr(WebMercator.ySql("lat")))
      .withColumn("lon2", expr(WebMercator.lonSql("x")))
      .withColumn("lat2", expr(WebMercator.latSql("y")))
      .collect()
    out.foreach { r =>
      val (lon, lat) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(r.getDouble(2) -
        WebMercator.R * math.toRadians(lon)) < 1e-6)
      assert(math.abs(r.getDouble(4) - lon) < 1e-9, s"lon rt $lon")
      assert(math.abs(r.getDouble(5) - lat) < 1e-9, s"lat rt $lat")
    }
  }

  test("UTM: published central-meridian invariants (EPSG:32619 definition)") {
    // on the central meridian: easting = FE exactly, northing = k0·M(φ)
    for (lat <- Seq(0.0, 36.0, 42.36, 48.0, 70.0)) {
      val (x, y) = forward(lat, p.lonODeg)
      assert(math.abs(x - 500000.0) < 1e-6, s"easting at lat $lat: $x")
      assert(math.abs(y - p.k0 * mOf(math.toRadians(lat))) < 1e-6)
    }
    // point scale on the central meridian is k0 = 0.9996: numeric
    // ∂x/∂λ against the local parallel radius N·cosφ
    val lat = 42.0
    val h = 1e-7
    val (x1, _) = forward(lat, p.lonODeg - math.toDegrees(h) / 2)
    val (x2, _) = forward(lat, p.lonODeg + math.toDegrees(h) / 2)
    val phi = math.toRadians(lat)
    val nRad = p.a / math.sqrt(1 - p.e2 * math.sin(phi) * math.sin(phi))
    val scale = (x2 - x1) / (h * nRad * math.cos(phi))
    assert(math.abs(scale - p.k0) < 1e-9, s"central-meridian scale $scale")
  }

  test("UTM scalar forward∘inverse closes far inside 1e-6°") {
    for (lon <- Seq(-72.0, -70.3, -69.0, -67.1, -66.0);
         lat <- Seq(0.5, 20.0, 36.0, 42.36, 48.0, 64.0)) {
      val (x, y) = forward(lat, lon)
      val (lat2, lon2) = inverse(x, y)
      assert(math.abs(lat2 - lat) < 1e-8, s"lat $lat,$lon → $lat2")
      assert(math.abs(lon2 - lon) < 1e-8, s"lon $lat,$lon → $lon2")
    }
  }

  test("UTM SQL expression path equals the independent scalar transcription") {
    val rows = Crs.utmWebmerc(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length > 0)
    rows.take(200).foreach { r =>
      val lon = r.getDouble(r.fieldIndex("lon"))
      val lat = r.getDouble(r.fieldIndex("lat"))
      val (x, y) = forward(lat, lon)
      assert(math.abs(r.getDouble(r.fieldIndex("utm_e")) - x) < 5e-4,
        s"easting at ($lat, $lon)")
      assert(math.abs(r.getDouble(r.fieldIndex("utm_n")) - y) < 5e-4,
        s"northing at ($lat, $lon)")
      // round trips come back as the inputs at the 4-decimal grid
      assert(r.getDouble(r.fieldIndex("utm_rt_lat")) ==
        BigDecimal(lat).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getDouble(r.fieldIndex("utm_rt_lon")) ==
        BigDecimal(lon).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getDouble(r.fieldIndex("wm_rt_lat")) ==
        BigDecimal(lat).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getDouble(r.fieldIndex("wm_rt_lon")) ==
        BigDecimal(lon).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }
}
