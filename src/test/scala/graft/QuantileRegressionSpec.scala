package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.QuantileRegression

/** Quantile regression (q164): recovery of a known conditional-quantile
  * ladder, pinball local optimality against coefficient perturbations,
  * the below-line calibration law, tail-vs-median ordering, and the
  * degenerate guard. Value-level oracle equivalence (identical IRLS
  * program in DuckDB) runs through graft.Verify. */
class QuantileRegressionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  /** 10-deep uniform error ladder e ∈ {−5,…,4} at each x ∈ 1..30 over
    * y = 10 + 2x + e: every conditional τ-quantile is an exact line
    * with slope 2 and intercept 10 + Q_τ(e). */
  private lazy val ladder = {
    import spark.implicits._
    (for (x <- 1 to 30; e <- -5 to 4)
      yield (x.toDouble, 10.0 + 2.0 * x + e)).toDF("x", "y")
  }

  private def fit(df: org.apache.spark.sql.DataFrame,
      taus: Seq[String] = QuantileRegression.Taus) =
    QuantileRegression.quantileFit(df, taus).collect()
      .map(r => r.getDouble(0) -> r).toMap

  test("recovers the planted quantile ladder: slope 2, ordered intercepts") {
    val m = fit(ladder)
    def b(tau: Double, c: String) =
      m(tau).getDouble(m(tau).fieldIndex(c))
    // slope is τ-free in the ladder (pure location shift)
    assert(math.abs(b(0.5, "b_slope") - 2.0) < 0.05, s"got ${b(0.5, "b_slope")}")
    assert(math.abs(b(0.9, "b_slope") - 2.0) < 0.05, s"got ${b(0.9, "b_slope")}")
    // Q_0.5(e) ∈ [-1, 0], Q_0.9(e) ∈ [3, 4]: intercepts land in-band
    assert(b(0.5, "b_intercept") > 8.5 && b(0.5, "b_intercept") < 10.5)
    assert(b(0.9, "b_intercept") > 12.5 && b(0.9, "b_intercept") < 14.5)
    assert(b(0.9, "b_intercept") > b(0.5, "b_intercept") + 2.0,
      "the P90 line must sit well above the median line")
  }

  test("pinball optimality: the fit beats every ±0.25 coefficient nudge") {
    val m = fit(ladder, Seq("0.5"))
    val r = m(0.5)
    val (b0, b1) = (r.getDouble(r.fieldIndex("b_intercept")),
      r.getDouble(r.fieldIndex("b_slope")))
    val pts = ladder.collect().map(p => (p.getDouble(0), p.getDouble(1)))
    def pin(a0: Double, a1: Double): Double = pts.map { case (x, y) =>
      val res = y - a0 - a1 * x
      res * (0.5 - (if (res < 0) 1.0 else 0.0))
    }.sum / pts.length
    val at = pin(b0, b1)
    assert(math.abs(at - r.getDouble(r.fieldIndex("pinball_mean"))) < 1e-4)
    for (d0 <- Seq(-0.25, 0.25); d1 <- Seq(-0.25, 0.0, 0.25))
      assert(at <= pin(b0 + d0, b1 + d1) + 1e-9, s"nudge ($d0, $d1) won")
    for (d1 <- Seq(-0.25, 0.25))
      assert(at <= pin(b0, b1 + d1) + 1e-9, s"slope nudge $d1 won")
  }

  test("calibration: frac_below ≈ τ at the optimum") {
    val m = fit(ladder)
    Seq(0.5, 0.9).foreach { tau =>
      val fb = m(tau).getDouble(m(tau).fieldIndex("frac_below"))
      assert(math.abs(fb - tau) < 0.06, s"tau=$tau frac_below=$fb")
    }
  }

  test("degenerate: constant x yields NULL coefficients, not garbage") {
    import spark.implicits._
    val df = (1 to 50).map(i => (7.0, i.toDouble)).toDF("x", "y")
    val rows = QuantileRegression.quantileFit(df, Seq("0.5")).collect()
    assert(rows.length == 1)
    assert(rows.head.isNullAt(rows.head.fieldIndex("b_intercept")))
    assert(rows.head.isNullAt(rows.head.fieldIndex("b_slope")))
  }

  test("grouped fit ≡ independent per-group fits; groups don't contaminate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // group A = the ladder; group B = a steeper, shifted ladder —
    // keyed IRLS must reproduce each group's standalone fit exactly
    // (same integer program, same iteration path)
    val a = ladder.withColumn("g", org.apache.spark.sql.functions.lit("A"))
    val b = ladder.select(col("x"), (col("y") * 3.0 + 5.0).as("y"))
      .withColumn("g", org.apache.spark.sql.functions.lit("B"))
    val both = a.unionByName(b)
    val grouped = QuantileRegression.quantileFitBy(both, Seq("g"), Seq("0.5"))
      .collect().map(r => r.getString(0) -> r).toMap
    val aAlone = fit(ladder, Seq("0.5"))(0.5)
    def d(r: org.apache.spark.sql.Row, c: String) = r.getDouble(r.fieldIndex(c))
    assert(d(grouped("A"), "b_intercept") == d(aAlone, "b_intercept"))
    assert(d(grouped("A"), "b_slope") == d(aAlone, "b_slope"))
    // B's ladder is y' = 3y + 5 = 35 + 6x + 3e: slope ≈ 6
    assert(math.abs(d(grouped("B"), "b_slope") - 6.0) < 0.15)
  }

  test("registered q166 at sf0.001: a fit per (brand, tau), calibrated") {
    val rows = QuantileRegression.brandLineRevenue(spark, "/root/testdata/sf0.001")
      .collect()
    val brands = rows.map(_.getString(0)).distinct
    assert(brands.length > 10, s"got ${brands.length} brands")
    assert(rows.length == brands.length * 2)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("b_slope"))) {
        val tau = r.getDouble(r.fieldIndex("tau"))
        val fb = r.getDouble(r.fieldIndex("frac_below"))
        assert(math.abs(fb - tau) < 0.15,
          s"${r.getString(0)} tau=$tau frac_below=$fb")
      }
    }
  }

  test("registered q164 at sf0.001: one finite row per tau, tail above median") {
    val m = QuantileRegression.lineRevenue(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getDouble(0) -> r).toMap
    assert(m.keySet == Set(0.5, 0.9))
    val mid = 25.0 // x̄ of l_quantity's 1..50 range
    def at(tau: Double) = {
      val r = m(tau)
      r.getDouble(r.fieldIndex("b_intercept")) +
        r.getDouble(r.fieldIndex("b_slope")) * mid
    }
    assert(at(0.9) > at(0.5), "the P90 revenue line must sit above the median line")
    m.values.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_rows")) > 0)
      assert(r.getDouble(r.fieldIndex("pinball_mean")) > 0.0)
    }
  }
}
