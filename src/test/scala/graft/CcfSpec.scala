package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Ccf

/** CCF invariants. Value-level oracle equivalence runs through
  * graft.Verify. */
class CcfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def ccfOf(xs: Seq[Long], ys: Seq[Long],
      maxLag: Int): Map[Int, Option[Double]] = {
    import spark.implicits._
    val df = xs.zip(ys).zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }.toDF("t", "x", "y")
    Ccf.ccf(df, "t", "x", "y", maxLag).collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
  }

  /** Full-precision reference straight from the estimator
    * definition (full-series means, pair-restricted numerator). */
  private def brute(xs: Seq[Long], ys: Seq[Long], k: Int): Option[Double] = {
    val n = xs.length
    val xb = xs.map(BigDecimal(_)).sum / n
    val yb = ys.map(BigDecimal(_)).sum / n
    val dx = xs.map(x => (BigDecimal(x) - xb).pow(2)).sum
    val dy = ys.map(y => (BigDecimal(y) - yb).pow(2)).sum
    if (dx == 0 || dy == 0) None
    else {
      val num = xs.dropRight(k).zip(ys.drop(k))
        .map { case (a, b) => (BigDecimal(a) - xb) * (BigDecimal(b) - yb) }.sum
      Some((num / (dx * dy).bigDecimal.sqrt(java.math.MathContext.DECIMAL64))
        .toDouble)
    }
  }

  test("identical series: ccf(k) equals acf(k), ccf(0) = 1 exactly") {
    val xs = Seq(503L, 1298L, 87L, 2201L, 950L, 1204L, 33L, 1780L,
      642L, 905L, 1433L, 210L)
    val got = ccfOf(xs, xs, 3)
    assert(got(0).get == 1.0)
    (1 to 3).foreach { k =>
      val want = brute(xs, xs, k).get
      assert(math.abs(got(k).get - want) < 1e-6, s"lag $k: ${got(k)} vs $want")
    }
  }

  test("constant x: zero variance -> NULL ccf at every lag") {
    val ys = Seq(1L, 5L, 2L, 9L, 4L, 7L, 3L, 8L)
    val got = ccfOf(Seq.fill(8)(42L), ys, 2)
    assert(got == Map(0 -> None, 1 -> None, 2 -> None))
  }

  test("planted lead: y = x shifted by 2 peaks at lag 2") {
    // y_{t} = x_{t-2}: x leads y by 2, so ccf should peak at k=2.
    // The base must carry no period-2 structure of its own or the
    // shift is confounded with the series' periodicity.
    val base = Seq(503L, 1298L, 87L, 2201L, 950L, 1204L, 33L, 1780L,
      642L, 905L, 1433L, 210L, 1650L, 777L, 1288L, 460L)
    val xs = base.drop(2)
    val ys = base.dropRight(2)
    val got = ccfOf(xs, ys, 4).map { case (k, v) => k -> v.get }
    assert(got(2) == got.values.max, s"expected peak at lag 2: $got")
    assert(got(2) > 0.9)
  }

  test("brute-force parity on independent irregular series") {
    val xs = Seq(503L, 1298L, 87L, 2201L, 950L, 1204L, 33L, 1780L,
      642L, 905L, 1433L, 210L, 1650L, 777L)
    val ys = Seq(7L, 3L, 11L, 2L, 9L, 5L, 13L, 1L, 8L, 6L, 12L, 4L, 10L, 0L)
    val got = ccfOf(xs, ys, 5)
    (0 to 5).foreach { k =>
      val want = brute(xs, ys, k).get
      assert(math.abs(got(k).get - want) < 1e-6, s"lag $k: ${got(k)} vs $want")
    }
  }

  test("q116 over testdata: 8 lags, pair counts consistent, |ccf| <= 1") {
    val rows = Ccf.dailyCountRevenueCcf(spark, dir).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) - r.getInt(0))
      if (!r.isNullAt(3)) assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9)
    }
  }
}
