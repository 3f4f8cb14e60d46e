package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.HuberRegression

/** Huber M-regression (q251): exact recovery on clean in-band data,
  * bounded influence under gross contamination (vs a driver OLS),
  * reference parity of the full fixed-point IRLS program, degenerate
  * NULLs, and the registered three-slopes frame. Value-level oracle
  * equivalence runs through graft.Verify. */
class HuberRegressionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fit(xs: Seq[(Double, Double)]) = {
    import spark.implicits._
    HuberRegression.huberFit(xs.toDF("x", "y")).collect().head
  }

  /** Driver twin of the engine program: same per-row IEEE terms, same
    * 1e-6 floors summed exactly, same Cramer text. */
  private def refHuber(xs: Seq[(Double, Double)], iters: Int = 8):
      (Double, Double) = {
    val delta = 10.0
    var (b0, b1) = (0.0, 0.0)
    var warm = true
    for (_ <- 0 to iters) {
      val ws = xs.map { case (x, y) =>
        if (warm) 1.0
        else {
          val r = y - (b0 + b1 * x)
          if (math.abs(r) <= delta) 1.0 else delta / math.abs(r)
        }
      }
      def s(f: ((Double, Double), Double) => Double): Double =
        xs.zip(ws).map { case (p, w) =>
          BigInt(math.floor(f(p, w) * 1e6).toLong) }.sum.toDouble / 1e6
      val (sw, sx, sxx, sy, sxy) = (
        s((_, w) => w), s((p, w) => w * p._1), s((p, w) => w * p._1 * p._1),
        s((p, w) => w * p._2), s((p, w) => w * p._1 * p._2))
      val det = sw * sxx - sx * sx
      b0 = (sxx * sy - sx * sxy) / det
      b1 = (sw * sxy - sx * sy) / det
      warm = false
    }
    (b0, b1)
  }

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("clean in-band data recovers the exact line (OLS regime)") {
    val xs = (1 to 20).map(i => (i.toDouble, 3.0 * i + 5.0))
    val row = fit(xs)
    assert(row.getDouble(row.fieldIndex("b_slope")) == 3.0)
    assert(row.getDouble(row.fieldIndex("b_intercept")) == 5.0)
    assert(row.getDouble(row.fieldIndex("frac_core")) == 1.0)
  }

  test("bounded influence: 20% gross outliers barely move the line," +
    " while OLS breaks") {
    val clean = (1 to 40).map(i => (i.toDouble, 2.0 * i + 1.0))
    val dirty = clean ++ (1 to 10).map(i => (i.toDouble, 500.0))
    val row = fit(dirty)
    val slope = row.getDouble(row.fieldIndex("b_slope"))
    assert(math.abs(slope - 2.0) < 0.35, s"huber slope $slope")
    // plain OLS on the same data for contrast
    val n = dirty.length.toDouble
    val (sx, sy) = (dirty.map(_._1).sum, dirty.map(_._2).sum)
    val sxx = dirty.map(p => p._1 * p._1).sum
    val sxy = dirty.map(p => p._1 * p._2).sum
    val ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(ols - 2.0) > 1.0, s"ols slope $ols should be broken")
    assert(row.getDouble(row.fieldIndex("frac_core")) < 1.0)
  }

  test("reference parity: the engine runs the same fixed-point program") {
    val rnd = new scala.util.Random(251)
    val xs = (1 to 60).map { i =>
      val x = i.toDouble / 3
      (x, 1.5 * x - 2.0 + rnd.nextGaussian() * 8.0)
    }
    val row = fit(xs)
    val (b0, b1) = refHuber(xs)
    assert(row.getDouble(row.fieldIndex("b_intercept")) == r6(b0))
    assert(row.getDouble(row.fieldIndex("b_slope")) == r6(b1))
  }

  test("constant x is NULL, not garbage") {
    val row = fit(Seq((2.0, 1.0), (2.0, 5.0), (2.0, 9.0)))
    assert(row.isNullAt(row.fieldIndex("b_slope")))
    assert(row.isNullAt(row.fieldIndex("b_intercept")))
  }

  test("registered q251 at sf0.001: one row, near-zero slope (the" +
    " q242-documented data fact), live core band") {
    val row = HuberRegression.lineRevenueHuber(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(row.getLong(row.fieldIndex("n_rows")) > 0)
    // testdata prices are independent of quantity (checked in DuckDB,
    // documented at q242): the robust slope reads ≈ 0, like OLS/P50
    assert(math.abs(row.getDouble(row.fieldIndex("b_slope"))) < 0.5)
    val core = row.getDouble(row.fieldIndex("frac_core"))
    assert(core > 0.0 && core < 1.0) // wide-revenue tail exists
    assert(row.getDouble(row.fieldIndex("mean_abs_resid")) > 0.0)
  }
}
