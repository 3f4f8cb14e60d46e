package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.GeoKnn

/** Grid KNN-within-radius invariants. Value-level oracle equivalence
  * runs through graft.Verify. */
class GeoKnnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def havKm(lat1: Long, lon1: Long, lat2: Long, lon2: Long): Double = {
    def rad(m: Long) = m / 1e6 * math.Pi / 180
    2 * GeoKnn.EarthKm * math.asin(math.sqrt(
      math.pow(math.sin((rad(lat2) - rad(lat1)) / 2), 2) +
        math.cos(rad(lat1)) * math.cos(rad(lat2)) *
          math.pow(math.sin((rad(lon2) - rad(lon1)) / 2), 2)))
  }

  private def run(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)],
      radius: Double, cellMicro: Long = 6000000L)
      : Map[Long, (Long, Double, Long)] = {
    import spark.implicits._
    GeoKnn.nearestWithin(left.toDF("k", "lat", "lon"),
      right.toDF("k", "lat", "lon"), radius, cellMicro)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
  }

  test("brute-force parity on pseudo-random points across cells") {
    val left = (1L to 40L).map(k =>
      (k, (k * 7919) % 80000000L - 40000000L,
        (k * 104729) % 340000000L - 170000000L))
    val right = (1L to 25L).map(k =>
      (k, (k * 15485863) % 80000000L - 40000000L,
        (k * 32452843) % 340000000L - 170000000L))
    // 30-deg cells: >= 2000 km of longitude even at |lat| = 40
    val got = run(left, right, 2000.0, 30000000L)
    val want = left.flatMap { case (lk, la, lo) =>
      val within = right
        .map { case (rk, ra, ro) => (rk, havKm(la, lo, ra, ro)) }
        .filter(_._2 <= 2000.0)
      if (within.isEmpty) None
      else Some(lk -> within.minBy(t => (t._2, t._1)))
    }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (lk, (rk, d)) =>
      assert(got(lk)._1 == rk, s"left $lk: got ${got(lk)._1}, want $rk")
      assert(math.abs(got(lk)._2 - d) < 1e-3)
    }
  }

  test("points farther than the radius never match") {
    // ~1113 km apart (10 deg of longitude at equator)
    val got = run(Seq((1L, 0L, 0L)), Seq((9L, 0L, 10000000L)), 500.0)
    assert(got.isEmpty)
    val hit = run(Seq((1L, 0L, 0L)), Seq((9L, 0L, 4000000L)), 500.0)
    assert(hit(1L)._1 == 9L &&
      math.abs(hit(1L)._2 - havKm(0, 0, 0, 4000000L)) < 0.01)
  }

  test("distance ties break by right key") {
    // two right points symmetric about the left point
    val got = run(Seq((1L, 0L, 0L)),
      Seq((7L, 0L, 1000000L), (3L, 0L, -1000000L)), 500.0)
    assert(got(1L)._1 == 3L && got(1L)._3 == 2L)
  }

  test("neighbor-cell candidates are found across a cell boundary") {
    // left at 5.99 deg lon, right at 6.01 deg: different cells, 2.2 km
    val got = run(Seq((1L, 0L, 5990000L)), Seq((2L, 0L, 6010000L)), 500.0)
    assert(got(1L)._1 == 2L && got(1L)._2 < 3.0)
  }

  test("q122 over testdata: matches within radius, n_cand >= 1") {
    val rows = GeoKnn.customerNearestSupplier(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) <= GeoKnn.RadiusKm)
      assert(r.getLong(3) >= 1)
    }
    // nearest join is 1 row per matched customer
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }
}
