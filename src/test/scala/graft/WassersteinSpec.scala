package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Wasserstein

/** Wasserstein-1 one-vs-rest distance (q181): point-mass hand case,
  * shift equivariance (the property PSI/KS/JS all lack), identity
  * zero, unit scaling, and the single-group NULL. Value-level oracle
  * equivalence runs through graft.Verify. */
class WassersteinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def w1(rows: Seq[(String, Long)], unit: Double = 1.0) = {
    import spark.implicits._
    Wasserstein.wassersteinOneVsRest(rows.toDF("g", "v").repartition(3), unit)
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("two point masses 10 apart: W1 = 10 from both sides") {
    val m = w1(Seq(("A", 0L), ("A", 0L), ("B", 10L), ("B", 10L)))
    assert(m("A").getDouble(m("A").fieldIndex("w1")) == 10.0)
    assert(m("B").getDouble(m("B").fieldIndex("w1")) == 10.0)
    assert(m("A").getLong(m("A").fieldIndex("n_seg")) == 2L)
    assert(m("A").getLong(m("A").fieldIndex("n_rest")) == 2L)
  }

  test("identical distributions: W1 = 0 exactly") {
    val m = w1(Seq(("A", 1L), ("A", 5L), ("B", 1L), ("B", 5L)))
    assert(m("A").getDouble(m("A").fieldIndex("w1")) == 0.0)
  }

  test("shift equivariance: moving one side by c moves W1 by c") {
    // A = {0, 2}, B = {0, 2} shifted by 7 → mean transport = 7
    val m = w1(Seq(("A", 0L), ("A", 2L), ("B", 7L), ("B", 9L)))
    assert(m("A").getDouble(m("A").fieldIndex("w1")) == 7.0)
  }

  test("unequal masses weight the integral: A={0}, rest={0,0,4}") {
    // F_A jumps to 1 at 0; F_rest = 2/3 on [0,4) → ∫|ΔF| = 1/3 · 4
    val m = w1(Seq(("A", 0L), ("B", 0L), ("B", 0L), ("B", 4L)))
    assert(m("A").getDouble(m("A").fieldIndex("w1")) == 1.333333)
  }

  test("unit scaling multiplies the distance") {
    val m = w1(Seq(("A", 0L), ("B", 3L)), unit = 100.0)
    assert(m("A").getDouble(m("A").fieldIndex("w1")) == 300.0)
  }

  test("single group: empty rest side → NULL, not a blowup") {
    val m = w1(Seq(("A", 1L), ("A", 2L)))
    assert(m("A").isNullAt(m("A").fieldIndex("w1")))
    assert(m("A").getLong(m("A").fieldIndex("n_rest")) == 0L)
  }
}
