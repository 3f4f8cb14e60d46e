package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Ses

/** SES backtest (q289): a direct truncated-SES cross-check, the
  * level-series case where SES beats the naive walk, split contract,
  * and the registered bake-off shape vs q272. Value-level oracle
  * equivalence runs through graft.Verify. */
class SesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def bt(xs: Seq[Long]) = {
    import spark.implicits._
    Ses.sesBacktest(
      xs.zipWithIndex.map { case (x, t) => ("a", t.toLong, x) }
        .toDF("g", "t", "x").repartition(4))
      .collect().head
  }

  /** Direct truncated-SES forecast with the same weights. */
  private def direct(hist: Seq[Long]): Double = {
    val a = 0.3
    val ws = (1 to Ses.Lags).map(j => a * math.pow(0.7, j - 1))
    val num = ws.zipWithIndex.map { case (w, i) =>
      w * hist(hist.size - 1 - i)
    }.sum
    num / ws.sum
  }

  test("MASE matches a direct truncated-SES holdout computation") {
    // deterministic noisy level: 100 + wobble
    val xs = (0 until 120).map(i =>
      100L + (if (i % 2 == 0) 7L else -7L) + (i % 5))
    val r = bt(xs)
    // direct: forecast each of the last-28 test points (t > tmax-28),
    // naive MAE from the train stretch
    val n = xs.size
    val testIdx = (0 until n).filter(i => i > n - 1 - 28)
    val aes = testIdx.map(i => math.abs(direct(xs.take(i)) - xs(i)))
    val trainIdx = (1 until n).filter(i => i <= n - 1 - 28)
    val naive = trainIdx.map(i => math.abs(xs(i) - xs(i - 1)).toDouble)
      .sum / trainIdx.size
    val mase = aes.map(v => math.floor(v * 1e2) / 1e2).sum / aes.size / naive
    assert(math.abs(r.getDouble(r.fieldIndex("mase")) - mase) < 1e-3)
  }

  test("noisy level series: SES beats the naive random walk (MASE < 1)") {
    val xs = (0 until 200).map(i =>
      1000L + (if (i % 2 == 0) 50L else -50L) + ((i * 7) % 11))
    val r = bt(xs)
    assert(r.getDouble(r.fieldIndex("mase")) < 1.0)
  }

  test("split contract: n_test counts only holdout points with a full lag bank") {
    val xs = (0 until 100).map(i => 10L + i % 3)
    val r = bt(xs)
    assert(r.getLong(r.fieldIndex("n_train")) == 100L - 28L)
    assert(r.getLong(r.fieldIndex("n_test")) == 28L)
  }

  test("registered bake-off shape: one row per priority, same split as q272") {
    val df = Ses.dailyRevenueSesBacktest(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq == Seq("o_orderpriority", "n_train", "n_test",
      "alpha", "mase", "smape"))
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("alpha")) == 0.3)
      assert(r.getDouble(r.fieldIndex("smape")) >= 0.0)
    }
  }
}
