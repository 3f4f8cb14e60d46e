package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Backtest

/** Backtest invariants. Value-level oracle equivalence runs through
  * graft.Verify. */
class BacktestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def bt(xs: Seq[Long], season: Int = 7) = {
    import spark.implicits._
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("t", "x")
    Backtest.naiveBacktest(df, "t", "x", season).head()
  }

  test("perfectly weekly series: seasonal-naive is exact, mase = 0") {
    val week = Seq(100L, 220L, 310L, 150L, 500L, 90L, 70L)
    val r = bt(week ++ week ++ week) // 21 days, period 7
    assert(r.getLong(0) == 21L && r.getLong(1) == 14L)
    assert(r.getDouble(2) == 0.0) // mae
    assert(r.getDouble(4) == 0.0) // mape
    assert(r.getDouble(5) == 0.0) // rmse
    assert(r.getDouble(6) == 0.0) // mase: seasonal exact, naive isn't
  }

  test("constant series: both forecasts exact, mase NULL (0/0)") {
    val r = bt(Seq.fill(20)(700L))
    assert(r.getDouble(2) == 0.0)
    assert(r.isNullAt(6), "0/0 mase must be NULL, not garbage")
  }

  test("brute-force parity on an irregular series") {
    val xs = Seq(503L, 1298L, 87L, 2201L, 950L, 1204L, 33L, 1780L,
      642L, 905L, 1433L, 210L, 1650L, 777L, 1288L, 460L)
    val r = bt(xs)
    val scored = xs.drop(7).zip(xs.dropRight(7)) // (x, pred)
    val n = scored.length
    val sae = scored.map { case (x, p) => math.abs(x - p) }.sum
    assert(r.getLong(1) == n.toLong)
    assert(math.abs(r.getDouble(2) - sae.toDouble / n / 100.0) < 5e-3)
    val se = scored.map { case (x, p) => x - p }.sum
    assert(math.abs(r.getDouble(3) - se.toDouble / n / 100.0) < 5e-3)
    val sppm = scored.map { case (x, p) => math.abs(x - p) * 1000000L / x }.sum
    assert(math.abs(r.getDouble(4) - sppm.toDouble / n / 1e4) < 1e-4)
    val sse = scored.map { case (x, p) => (x - p).toDouble * (x - p) }.sum
    assert(math.abs(r.getDouble(5) - math.sqrt(sse / n) / 100.0) < 5e-3)
    val saeN = xs.drop(1).zip(xs.dropRight(1))
      .map { case (x, p) => math.abs(x - p) }.sum
    val mase = sae.toDouble * (xs.length - 1) / (saeN.toDouble * n)
    assert(math.abs(r.getDouble(6) - mase) < 1e-6)
  }

  test("q115 over testdata: scored set is n_days - 7, mase finite positive") {
    val r = Backtest.dailyRevenueBacktest(spark, dir).head()
    assert(r.getLong(1) == r.getLong(0) - 7L)
    assert(r.getDouble(2) > 0.0 && r.getDouble(5) >= r.getDouble(2),
      "rmse >= mae always")
    assert(r.getDouble(6) > 0.0)
  }
}
