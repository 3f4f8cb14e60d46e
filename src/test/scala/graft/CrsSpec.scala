package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Crs
import operators.Crs.{LccParams, MassMainland, PhiIters}

/** CRS reprojection invariants. The anchors are the DEFINING properties
  * of the Lambert Conformal Conic (2SP): the false origin projects to
  * (falseE, falseN), the central meridian projects to easting = falseE,
  * scale is exactly 1 along both standard parallels (and <1 between,
  * >1 outside), and forward∘inverse is the identity to double
  * precision. The Catalyst expression path is additionally checked
  * against an independent plain-Scala implementation of Snyder's
  * formulas, so the SQL-fragment plumbing can't silently drift. */
class CrsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  import spark.implicits._

  val p: LccParams = MassMainland

  // independent scalar implementation (Snyder 15-1..15-11), used as the
  // reference for the expression path
  private def tOf(phi: Double): Double =
    math.tan(math.Pi / 4 - phi / 2) /
      math.pow((1 - p.e * math.sin(phi)) / (1 + p.e * math.sin(phi)), p.e / 2)
  private def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val rho = p.a * p.coneF * math.pow(tOf(phi), p.coneN)
    val th = p.coneN * (math.toRadians(lonDeg) - p.lon0)
    (p.falseE + rho * math.sin(th), p.falseN + p.rho0 - rho * math.cos(th))
  }
  private def inverse(en: Double, nn: Double): (Double, Double) = {
    val rhoP = math.sqrt(math.pow(en - p.falseE, 2) + math.pow(p.rho0 - (nn - p.falseN), 2))
    val tp = math.pow(rhoP / (p.a * p.coneF), 1.0 / p.coneN)
    val lon = math.atan2(en - p.falseE, p.rho0 - (nn - p.falseN)) / p.coneN + p.lon0
    var phi = math.Pi / 2 - 2 * math.atan(tp)
    for (_ <- 1 to PhiIters)
      phi = math.Pi / 2 - 2 * math.atan(
        tp * math.pow((1 - p.e * math.sin(phi)) / (1 + p.e * math.sin(phi)), p.e / 2))
    (math.toDegrees(phi), math.toDegrees(lon))
  }

  test("false origin projects to (falseE, falseN); central meridian to easting = falseE") {
    val (e0, n0) = forward(p.latODeg, p.lonODeg)
    assert(math.abs(e0 - p.falseE) < 1e-6, s"easting of origin: $e0")
    assert(math.abs(n0 - p.falseN) < 1e-6, s"northing of origin: $n0")
    for (lat <- Seq(41.0, 41.5, 42.0, 42.5, 43.0)) {
      val (e, _) = forward(lat, p.lonODeg)
      assert(math.abs(e - p.falseE) < 1e-6, s"central meridian easting at $lat: $e")
    }
  }

  test("scale is 1 on both standard parallels, <1 between, >1 outside") {
    // parallel-direction scale k = rho(phi)*n / (a*m(phi)) (Snyder 15-4)
    def k(latDeg: Double): Double = {
      val phi = math.toRadians(latDeg)
      val m = math.cos(phi) / math.sqrt(1 - p.e2 * math.sin(phi) * math.sin(phi))
      val rho = p.a * p.coneF * math.pow(tOf(phi), p.coneN)
      rho * p.coneN / (p.a * m)
    }
    assert(math.abs(k(p.lat1Deg) - 1.0) < 1e-12, s"k(phi1)=${k(p.lat1Deg)}")
    assert(math.abs(k(p.lat2Deg) - 1.0) < 1e-12, s"k(phi2)=${k(p.lat2Deg)}")
    assert(k((p.lat1Deg + p.lat2Deg) / 2) < 1.0)
    assert(k(p.lat1Deg - 0.5) > 1.0 && k(p.lat2Deg + 0.5) > 1.0)
  }

  test("expression inverse matches the independent scalar implementation") {
    val pts = for (e <- Seq(60000.0, 200000.0, 310000.0); n <- Seq(710000.0, 820000.0, 930000.0))
      yield (e, n)
    val got = pts.toDF("easting", "northing")
      .withColumn("tp", expr(p.tPrimeSql("easting", "northing")))
      .withColumn("phi", expr(p.phiSeedSql("tp")))
    val iterated = (1 to PhiIters).foldLeft(got) { (d, _) =>
      d.withColumn("phi", expr(p.phiStepSql("tp", "phi")))
    }
    val rows = iterated
      .select(col("easting"), col("northing"),
        expr("degrees(phi)").as("lat"),
        expr(p.lonSql("easting", "northing")).as("lon"))
      .collect()
    rows.foreach { r =>
      val (wantLat, wantLon) = inverse(r.getDouble(0), r.getDouble(1))
      assert(math.abs(r.getDouble(2) - wantLat) < 1e-9, s"lat at $r, want $wantLat")
      assert(math.abs(r.getDouble(3) - wantLon) < 1e-9, s"lon at $r, want $wantLon")
    }
  }

  test("q54 round trip reproduces the integer easting/northing exactly after round(,4)") {
    val df = Crs.reproject(spark, "/root/testdata/sf0.001").cache()
    assert(df.count() > 0)
    assert(df.filter(col("rt_easting") =!= col("easting")).count() == 0)
    assert(df.filter(col("rt_northing") =!= col("northing")).count() == 0)
    // outputs land where Massachusetts is
    val r = df.agg(min("lat"), max("lat"), min("lon"), max("lon")).head
    assert(r.getDouble(0) > 40.0 && r.getDouble(1) < 43.5)
    assert(r.getDouble(2) > -74.0 && r.getDouble(3) < -69.0)
    df.unpersist()
  }
}
