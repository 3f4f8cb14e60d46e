package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.DurbinWatson

/** Durbin–Watson (q209): hand-computed alternating-residual case,
  * the independent-looking midpoint, exact-fit and singular NULLs.
  * Value-level oracle equivalence runs through graft.Verify. */
class DurbinWatsonSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def dw(pts: Seq[(Long, Double)]) = {
    import spark.implicits._
    DurbinWatson.dwTest(
      pts.map { case (x, y) => (1L, x, y) }.toDF("g", "x", "y")
        .repartition(4))
      .collect().head
  }

  test("alternating residuals: DW = 3.4 exactly on the hand case") {
    // y on x=0..3 with y=(1,0,3,2): b1=0.6, b0=0.6, residuals
    // (0.4,-1.2,1.2,-0.4) → Σe²=3.2, Σ(Δe)²=10.88, DW=3.4 (>2:
    // negative serial correlation, as alternation should read)
    val r = dw(Seq((0L, 1.0), (1L, 0.0), (2L, 3.0), (3L, 2.0)))
    assert(r.getDouble(r.fieldIndex("dw")) == 3.4)
    assert(r.getDouble(r.fieldIndex("rho_1")) == -0.7)
    assert(r.getDouble(r.fieldIndex("b1")) == 0.6)
  }

  test("positively drifting residuals push DW toward 0") {
    // a hump against the flat fit leaves three long same-sign
    // residual runs (small Δe inside each run) → DW = 0.75 exactly,
    // ρ̂₁ = 0.625 (strong positive serial correlation)
    val r = dw((0L to 11L).map(x =>
      (x, if (x >= 4 && x < 8) 10.0 else 0.0)))
    assert(r.getDouble(r.fieldIndex("dw")) == 0.75)
    assert(r.getDouble(r.fieldIndex("rho_1")) == 0.625)
  }

  test("exact linear fit: zero residuals make DW NULL (0/0 guarded)") {
    val r = dw(Seq((0L, 1.0), (1L, 3.0), (2L, 5.0), (3L, 7.0)))
    assert(r.isNullAt(r.fieldIndex("dw")))
  }

  test("constant x is singular: b1 and DW are NULL") {
    val r = dw(Seq((2L, 1.0), (2L, 3.0), (2L, 5.0)))
    assert(r.isNullAt(r.fieldIndex("b1")))
    assert(r.isNullAt(r.fieldIndex("dw")))
  }
}
