package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.CoxPh

/** Cox proportional hazards (q200): closed-form hand case, the
  * censoring-enters-the-risk-set proof, translation invariance of the
  * fitted effect, degenerate NULL contracts, and group independence.
  * Value-level oracle equivalence (identical unrolled Newton cascade
  * in DuckDB) runs through graft.Verify. */
class CoxPhSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fit(obs: Seq[(String, Long, Int, Long)]) = {
    import spark.implicits._
    CoxPh.coxPhBy(obs.toDF("g", "dur", "event", "x").repartition(7), "g")
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("closed-form hand case: beta = -ln(2)/2") {
    // events (x=1,t=1), (x=0,t=2), (x=1,t=3): the partial likelihood
    // e^b/(2e^b+1) * 1/(e^b+1) has its maximum at e^b = 1/sqrt(2),
    // i.e. beta = -0.5*ln 2 = -0.34657359...; Newton from 0 converges
    // far past round-6 in 6 steps.
    val r = fit(Seq(("a", 1L, 1, 1L), ("a", 2L, 1, 0L), ("a", 3L, 1, 1L)))("a")
    assert(r.getLong(r.fieldIndex("n_subjects")) == 3L)
    assert(r.getLong(r.fieldIndex("n_events")) == 3L)
    assert(math.abs(r.getDouble(r.fieldIndex("beta")) -
      (-0.5 * math.log(2.0))) < 2e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("hazard_ratio")) -
      1.0 / math.sqrt(2.0)) < 2e-6)
  }

  test("a censored subject enters risk sets: the MLE moves to exactly 0") {
    // adding (x=0, t=1, censored) to the hand case rebalances the
    // t=1 risk set to {1,1,0,0}: U(0) = (1-1/2) + (0-1/2) + 0 = 0, so
    // beta = 0 is the exact MLE and Newton never leaves it. If the
    // censored row were (wrongly) dropped from the risk set, beta
    // would stay at -ln(2)/2.
    val r = fit(Seq(("a", 1L, 1, 1L), ("a", 2L, 1, 0L), ("a", 3L, 1, 1L),
      ("a", 1L, 0, 0L)))("a")
    assert(r.getLong(r.fieldIndex("n_events")) == 3L)
    assert(r.getDouble(r.fieldIndex("beta")) == 0.0)
    assert(r.getDouble(r.fieldIndex("hazard_ratio")) == 1.0)
  }

  test("translation invariance: shifting x by a constant leaves beta") {
    val base = Seq(("a", 1L, 1, 3L), ("a", 2L, 1, 1L), ("a", 3L, 1, 4L),
      ("a", 4L, 0, 2L), ("a", 5L, 1, 2L), ("a", 6L, 1, 5L))
    val b0 = fit(base)("a")
    val b7 = fit(base.map { case (g, d, e, x) => (g, d, e, x + 7L) })("a")
    assert(math.abs(b0.getDouble(b0.fieldIndex("beta")) -
      b7.getDouble(b7.fieldIndex("beta"))) < 1e-5)
    assert(math.abs(b0.getDouble(b0.fieldIndex("se_beta")) -
      b7.getDouble(b7.fieldIndex("se_beta"))) < 1e-5)
  }

  test("degenerate groups: constant covariate and no events give NULLs") {
    val m = fit(Seq(
      ("const", 1L, 1, 2L), ("const", 2L, 1, 2L), ("const", 3L, 0, 2L),
      ("noev", 1L, 0, 1L), ("noev", 2L, 0, 3L)))
    assert(m("const").isNullAt(m("const").fieldIndex("beta")))
    assert(m("noev").isNullAt(m("noev").fieldIndex("beta")))
  }

  test("group independence: a divergent group never perturbs a clean one") {
    val clean = Seq(("a", 1L, 1, 1L), ("a", 2L, 1, 0L), ("a", 3L, 1, 1L))
    // monotone likelihood in b: every event is on the high-x arm while
    // low-x subjects outlive them — beta runs off (clamped), but only
    // within its own group
    val diverging = Seq(("b", 1L, 1, 9L), ("b", 2L, 1, 9L),
      ("b", 9L, 0, 0L), ("b", 9L, 0, 0L))
    val solo = fit(clean)("a").getDouble(3)
    val both = fit(clean ++ diverging)("a").getDouble(3)
    assert(solo == both)
  }
}
