package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Sprt

/** Wald SPRT (q197): hand-computed crossing days for pure-success and
  * pure-failure runs, first-crossing precedence, the continue state,
  * and boundary values. Value-level oracle equivalence runs through
  * graft.Verify. */
class SprtSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  // H0: p = 0.5 vs H1: p = 0.8 at α = β = 0.05:
  // L1 = ln 1.6 ≈ 0.4700, L0 = ln 0.4 ≈ −0.9163, bounds ±ln 19 ≈ ±2.9444
  private def run(days: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    Sprt.sprt(days.toDF("d", "m", "x"), 0.5, 0.8, 0.05, 0.05)
      .collect().head
  }

  test("pure successes cross the upper bound at day ⌈ln19/ln1.6⌉ = 7") {
    val r = run((1L to 20L).map(d => (d, 1L, 1L)))
    assert(r.getString(r.fieldIndex("decision")) == "accept_h1")
    assert(r.getLong(r.fieldIndex("decided_period")) == 7L)
    assert(r.getDouble(r.fieldIndex("upper_bound")) == 2.944439)
  }

  test("pure failures cross the lower bound at day ⌈ln19/ln2.5⌉ = 4") {
    val r = run((1L to 20L).map(d => (d, 1L, 0L)))
    assert(r.getString(r.fieldIndex("decision")) == "accept_h0")
    assert(r.getLong(r.fieldIndex("decided_period")) == 4L)
  }

  test("an early H1 crossing wins even if the walk later dives to H0") {
    val days = (1L to 10L).map(d => (d, 1L, 1L)) ++
      (11L to 40L).map(d => (d, 1L, 0L))
    val r = run(days)
    assert(r.getString(r.fieldIndex("decision")) == "accept_h1")
    assert(r.getLong(r.fieldIndex("decided_period")) == 7L)
  }

  test("a short balanced run is CONTINUE with a NULL decision day") {
    val r = run(Seq((1L, 1L, 1L), (2L, 1L, 0L), (3L, 1L, 1L), (4L, 1L, 0L)))
    assert(r.getString(r.fieldIndex("decision")) == "continue")
    assert(r.isNullAt(r.fieldIndex("decided_period")))
  }

  test("the symmetric-error design has symmetric bounds") {
    val r = run(Seq((1L, 1L, 1L)))
    assert(r.getDouble(r.fieldIndex("upper_bound")) ==
      -r.getDouble(r.fieldIndex("lower_bound")))
  }
}
