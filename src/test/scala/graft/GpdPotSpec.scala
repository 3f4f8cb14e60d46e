package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.GpdPot

/** GPD peaks-over-threshold (q202): exact-threshold selection, a
  * hand-computed MoM fit, the tie-straddling boundary split, the
  * degenerate contracts, and group independence. Value-level oracle
  * equivalence runs through graft.Verify. */
class GpdPotSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fit(vals: Seq[(String, Long)]) = {
    import spark.implicits._
    GpdPot.gpdPot(vals.toDF("g", "x").repartition(7))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("hand-computed MoM fit on a linear 30-point tail") {
    // n = 600 → k = 30; body 569×1 plus u = 1000, tail = 1001..1030:
    // excesses 1..30 → ȳ = 15.5, s² = 77.5, r = 3.1 → ξ = -1.05,
    // σ = 31.775 exactly on the display grids
    val vals = Seq.fill(569)(("a", 1L)) ++ Seq(("a", 1000L)) ++
      (1 to 30).map(i => ("a", 1000L + i))
    val r = fit(vals)("a")
    assert(r.getLong(r.fieldIndex("n_rows")) == 600L)
    assert(r.getLong(r.fieldIndex("k_tail")) == 30L)
    assert(r.getLong(r.fieldIndex("u")) == 1000L)
    assert(r.getDouble(r.fieldIndex("xi")) == -1.05)
    assert(r.getDouble(r.fieldIndex("sigma")) == 31.775)
    // return level recomputed with the same snapped-power convention
    val lam = 30.0 / 600.0
    val rl3 = 1000.0 + 31.775 / -1.05 *
      (math.exp(-1.05 * math.log(lam / 1e-3)) - 1.0)
    assert(math.abs(r.getDouble(r.fieldIndex("rl_p3")) - rl3) < 0.02)
  }

  test("a tie cell straddling the k-boundary contributes its exact share") {
    // top cells: 25×(u+10) then 10×u (u = 500): the u-cell covers
    // positions 26..35, so exactly 5 of its copies are tail (y = 0):
    // sy = 25·10 = 250
    val vals = Seq.fill(565)(("a", 1L)) ++
      Seq.fill(10)(("a", 500L)) ++ Seq.fill(25)(("a", 510L))
    val r = fit(vals)("a")
    assert(r.getLong(r.fieldIndex("u")) == 500L)
    val ybar = 250.0 / 30.0
    val s2 = (2500.0 - 250.0 * 250.0 / 30.0) / 29.0
    val rr = ybar * ybar / s2
    assert(math.abs(r.getDouble(r.fieldIndex("xi")) - 0.5 * (1 - rr)) < 1e-6)
  }

  test("constant excesses: zero spread NULLs the fit") {
    val vals = Seq.fill(570)(("a", 1L)) ++ Seq(("a", 100L)) ++
      Seq.fill(30)(("a", 105L))
    val r = fit(vals)("a")
    assert(r.isNullAt(r.fieldIndex("xi")))
    assert(r.isNullAt(r.fieldIndex("rl_p4")))
  }

  test("a group too small for a threshold yields NULLs, not a crash") {
    val r = fit((1 to 20).map(i => ("tiny", i.toLong)))("tiny")
    assert(r.isNullAt(r.fieldIndex("u")))
    assert(r.isNullAt(r.fieldIndex("xi")))
  }

  test("group independence") {
    val a = Seq.fill(569)(("a", 1L)) ++ Seq(("a", 1000L)) ++
      (1 to 30).map(i => ("a", 1000L + i))
    val b = (1 to 2000).map(i => ("b", (i % 97 + 1).toLong))
    val solo = fit(a)("a").getDouble(4)
    val both = fit(a ++ b)("a").getDouble(4)
    assert(solo == both)
  }
}
