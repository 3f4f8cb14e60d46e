package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.YuleWalker

/** AR(2) one-step backtest (q272): a perfectly-forecastable AR series
  * drives MASE far below 1, pure noise holds MASE near 1, metrics
  * match a direct double computation, degenerate guard, registered
  * shape. Value-level oracle equivalence runs through graft.Verify. */
class ArBacktestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def bt(xs: Seq[Long]) = {
    import spark.implicits._
    YuleWalker.arBacktest(
      xs.zipWithIndex.map { case (x, t) => ("G", t.toLong, x) }
        .toDF("g", "t", "x").repartition(4))
      .collect().head
  }

  test("strongly autoregressive series: MASE well below naive") {
    // x_t = 0.9 x_{t-1} + small deterministic wobble around 1000
    var x = 1000.0
    val xs = (0 until 160).map { i =>
      x = 1000.0 + 0.9 * (x - 1000.0) + (if (i % 2 == 0) 40.0 else -40.0)
      math.round(x)
    }
    val r = bt(xs)
    assert(r.getDouble(r.fieldIndex("mase")) < 0.9)
    assert(r.getDouble(r.fieldIndex("smape")) < 0.2)
  }

  test("metrics match a direct double computation") {
    val xs = (0 until 120).map(i =>
      (2000 + 37 * (i % 5) - 11 * (i % 7) + (i % 3) * 23).toLong)
    val n = xs.size
    val test = 28
    val train = xs.take(n - test)
    // YW fit on train (biased autocovariances, mean-cleared)
    val mu = train.map(_.toDouble).sum / train.size
    def c(k: Int) = train.drop(k).zip(train)
      .map { case (a, b) => (a - mu) * (b - mu) }.sum
    val (c0, c1, c2) = (c(0), c(1), c(2))
    val det = c0 * c0 - c1 * c1
    val phi1 = c1 * (c0 - c2) / det
    val phi2 = (c2 * c0 - c1 * c1) / det
    val fc = (n - test until n).map { t =>
      mu + phi1 * (xs(t - 1) - mu) + phi2 * (xs(t - 2) - mu)
    }
    val ae = fc.zip(xs.drop(n - test)).map { case (f, a) => math.abs(f - a) }
    val naive = train.sliding(2).map(p => math.abs(p(1) - p(0)).toDouble).sum /
      (train.size - 1)
    val mase = ae.sum / test / naive
    val smape = fc.zip(xs.drop(n - test))
      .map { case (f, a) => 2 * math.abs(f - a) / (math.abs(f) + a) }
      .sum / test
    val r = bt(xs)
    assert(math.abs(r.getDouble(r.fieldIndex("phi1")) - phi1) < 1e-3)
    assert(math.abs(r.getDouble(r.fieldIndex("mase")) - mase) < 1e-2)
    assert(math.abs(r.getDouble(r.fieldIndex("smape")) - smape) < 1e-3)
    assert(r.getLong(r.fieldIndex("n_train")) == (n - test).toLong)
    assert(r.getLong(r.fieldIndex("n_test")) == test.toLong)
  }

  test("constant train series: degenerate fit NULLs the metrics") {
    val xs = Seq.fill(100)(500L) ++ (0 until 28).map(i => 500L + i)
    val r = bt(xs.toSeq)
    assert(r.isNullAt(r.fieldIndex("phi1")))
    assert(r.isNullAt(r.fieldIndex("mase")))
  }

  test("registered shape: one row per priority, metrics populated") {
    val rows = YuleWalker
      .dailyRevenueArBacktest(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("smape")) >= 0.0)
      assert(r.getDouble(r.fieldIndex("mase")) >= 0.0)
    }
  }
}
