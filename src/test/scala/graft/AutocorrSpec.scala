package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Autocorr

/** ACF invariants. Value-level oracle equivalence runs through
  * graft.Verify. */
class AutocorrSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def acfOf(xs: Seq[Long], maxLag: Int): Map[Int, Option[Double]] = {
    import spark.implicits._
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("t", "x")
    Autocorr.acf(df, "t", "x", maxLag).collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
  }

  /** Full-precision reference: the same cleared-denominator integers,
    * straight from the definition. */
  private def brute(xs: Seq[Long], k: Int): Option[Double] = {
    val n = BigInt(xs.length)
    val s = xs.map(BigInt(_)).sum
    val q = xs.map(x => BigInt(x) * x).sum
    val den = n * n * q - n * s * s
    if (den == 0) None
    else {
      val p = xs.dropRight(k).zip(xs.drop(k)).map { case (a, b) => BigInt(a) * b }.sum
      val h = xs.dropRight(k).map(BigInt(_)).sum
      val t = xs.drop(k).map(BigInt(_)).sum
      val num = n * n * p - n * s * (h + t) + (n - k) * s * s
      Some(num.toDouble / den.toDouble)
    }
  }

  test("constant series: zero variance -> NULL acf at every lag") {
    val got = acfOf(Seq.fill(20)(700L), 3)
    assert(got == Map(1 -> None, 2 -> None, 3 -> None))
  }

  test("alternating series: acf(k) = (-1)^k (n-k)/n exactly") {
    val n = 10
    val xs = (0 until n).map(i => if (i % 2 == 0) 100L else -100L)
    val got = acfOf(xs, 3)
    assert(got(1).get == -0.9 && got(2).get == 0.8 && got(3).get == -0.7)
  }

  test("brute-force parity on an irregular series") {
    val xs = Seq(503L, 1298L, 87L, 2201L, 950L, 1204L, 33L, 1780L,
      642L, 905L, 1433L, 210L, 1650L, 777L, 1288L, 460L)
    val got = acfOf(xs, 5)
    (1 to 5).foreach { k =>
      val want = brute(xs, k).get
      assert(math.abs(got(k).get - want) < 1e-6, s"lag $k: ${got(k)} vs $want")
    }
  }

  test("q111 over testdata: 7 lags, pair counts consistent, |acf| <= 1") {
    val rows = Autocorr.dailyRevenueAcf(spark, dir).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) - r.getInt(0))
      if (!r.isNullAt(3)) assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9)
    }
  }
}
