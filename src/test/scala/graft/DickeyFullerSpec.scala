package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.DickeyFuller

/** Dickey–Fuller (q210): exact γ on a perfectly mean-reverting
  * series, a hand-computed noisy case, random-walk-vs-reverting τ
  * ordering, and degenerate NULLs. Value-level oracle equivalence
  * runs through graft.Verify. */
class DickeyFullerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def df(ys: Seq[Double]) = {
    import spark.implicits._
    DickeyFuller.dfTest(
      ys.zipWithIndex.map { case (y, i) => (1L, i.toLong, y) }
        .toDF("g", "x", "y").repartition(4))
      .collect().head
  }

  test("perfect alternation: gamma = -2 exactly, tau NULL on exact fit") {
    // y = 0,10,0,10,...: dy = 10 - 2*ylag exactly → γ=-2, SSE=0
    val r = df(Seq(0.0, 10.0, 0.0, 10.0, 0.0, 10.0))
    assert(r.getDouble(r.fieldIndex("gamma")) == -2.0)
    assert(r.getDouble(r.fieldIndex("ar1_coef")) == -1.0)
    assert(r.getDouble(r.fieldIndex("se_gamma")) == 0.0)
    assert(r.isNullAt(r.fieldIndex("tau_df")))
  }

  test("hand case: gamma = -1.038462, tau ≈ -1.80") {
    // y=(0,2,1,3,2,4): pairs n=5, Sxx=5.2, Sxy=-5.4, Syy=10.8 →
    // γ=-27/26, SSE=5.192308, SE=0.576923, τ=-1.8
    val r = df(Seq(0.0, 2.0, 1.0, 3.0, 2.0, 4.0))
    assert(r.getDouble(r.fieldIndex("gamma")) == -1.038462)
    val tau = r.getDouble(r.fieldIndex("tau_df"))
    assert(tau > -1.9 && tau < -1.7)
  }

  test("a deterministic ramp (unit root-ish) reads tau near 0, " +
    "a reverting series reads strongly negative") {
    val ramp = df(Seq(0.0, 1.1, 1.9, 3.2, 3.8, 5.1, 5.9, 7.2, 7.8, 9.1))
    val revert = df(Seq(0.0, 9.0, 1.0, 8.0, 0.5, 9.5, 1.5, 8.5, 0.0, 9.0))
    val tRamp = ramp.getDouble(ramp.fieldIndex("tau_df"))
    val tRev = revert.getDouble(revert.fieldIndex("tau_df"))
    assert(tRev < -2.86) // past the 5% DF critical value
    assert(tRamp > tRev && tRamp > -2.0)
  }

  test("constant series is degenerate: gamma NULL") {
    val r = df(Seq(5.0, 5.0, 5.0, 5.0))
    assert(r.isNullAt(r.fieldIndex("gamma")))
  }
}
