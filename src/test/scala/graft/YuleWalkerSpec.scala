package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.YuleWalker

/** Yule–Walker AR(2) (q217): exact rational fit on the alternation
  * (finite-sample −10/11, −1/11), PACF(2) ≈ 0 read, constant NULL,
  * group isolation. Value-level oracle equivalence runs through
  * graft.Verify. */
class YuleWalkerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fit(rows: Seq[(Int, Long, Long)]) = {
    import spark.implicits._
    YuleWalker.ar2(rows.toDF("g", "t", "x").repartition(4))
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  private def d(r: org.apache.spark.sql.Row, c: String): Double =
    r.getDouble(r.fieldIndex(c))

  test("alternation (1,0)×3: the exact finite-sample YW solution") {
    // e' = (3,−3,3,−3,3,−3): C₀ = 54, C₁ = −45, C₂ = 36
    // ρ₁ = −5/6, ρ₂ = 2/3, φ₁ = −10/11, φ₂ = −1/11, σ²/γ₀ = 10/33
    val r = fit(Seq((1, 0L, 1L), (1, 1L, 0L), (1, 2L, 1L),
      (1, 3L, 0L), (1, 4L, 1L), (1, 5L, 0L)))(1)
    assert(d(r, "rho1") == -0.833333)
    assert(d(r, "rho2") == 0.666667)
    assert(d(r, "phi1") == -0.909091)
    assert(d(r, "phi2") == -0.090909)
    assert(d(r, "sigma_ratio") == 0.30303)
  }

  test("near-AR(1) geometric decay: PACF(2) = φ₂ reads near zero") {
    // an exact AR(1)-flavored series: x ~ decaying toward the mean;
    // the order-selection read is |φ₂| ≪ |φ₁|
    val xs = Seq(64L, 32L, 16L, 8L, 4L, 2L, 1L, 0L, 0L, 0L)
    val r = fit(xs.zipWithIndex.map { case (x, i) => (1, i.toLong, x) })(1)
    // hand values: φ₁ = 0.484613, φ₂ = −0.054409 (demeaning pulls the
    // raw 0.5 decay down; the ORDER read |φ₂| ≪ φ₁ is the point)
    assert(d(r, "phi1") == 0.484613)
    assert(d(r, "phi2") == -0.054409)
    assert(math.abs(d(r, "phi2")) < math.abs(d(r, "phi1")) / 5)
  }

  test("constant series is NULL (zero variance)") {
    val r = fit(Seq((1, 0L, 5L), (1, 1L, 5L), (1, 2L, 5L), (1, 3L, 5L)))(1)
    assert(r.isNullAt(r.fieldIndex("phi1")))
  }

  test("n < 4 is NULL") {
    val r = fit(Seq((1, 0L, 1L), (1, 1L, 2L), (1, 2L, 4L)))(1)
    assert(r.isNullAt(r.fieldIndex("phi2")))
  }

  test("groups fit independently") {
    val m = fit(
      Seq((1, 0L, 1L), (1, 1L, 0L), (1, 2L, 1L), (1, 3L, 0L),
        (1, 4L, 1L), (1, 5L, 0L)) ++
      Seq((2, 0L, 5L), (2, 1L, 5L), (2, 2L, 5L), (2, 3L, 5L)))
    assert(d(m(1), "phi1") == -0.909091)
    assert(m(2).isNullAt(m(2).fieldIndex("phi1")))
  }
}
