package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.SegmentedReg

/** Segmented regression at a known break (q207): exact hinge
  * recovery, the no-change b2 = 0 case, direction of a planted
  * change under noise, singular contracts, and group independence.
  * Value-level oracle equivalence runs through graft.Verify. */
class SegmentedRegSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fit(rows: Seq[(String, Long, Double, Long)]) = {
    import spark.implicits._
    SegmentedReg.segmentedFit(rows.toDF("g", "x", "y", "tb").repartition(5))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("exact hinge: y = 2 + 3x + 2*max(0, x-10) recovered exactly") {
    val rows = (0 to 20).map { i =>
      val y = 2.0 + 3.0 * i + 2.0 * math.max(0, i - 10)
      ("a", i.toLong, y, 10L)
    }
    val r = fit(rows)("a")
    assert(r.getDouble(r.fieldIndex("b0")) == 2.0)
    assert(r.getDouble(r.fieldIndex("b1_pre")) == 3.0)
    assert(r.getDouble(r.fieldIndex("b2_change")) == 2.0)
    assert(r.getDouble(r.fieldIndex("slope_post")) == 5.0)
    assert(r.getDouble(r.fieldIndex("se_b2")) == 0.0)
    assert(r.isNullAt(r.fieldIndex("t_b2"))) // exact fit: no noise scale
  }

  test("a pure line fits with b2 = 0 exactly") {
    val rows = (0 to 15).map(i => ("a", i.toLong, 1.0 + 2.0 * i, 7L))
    val r = fit(rows)("a")
    assert(r.getDouble(r.fieldIndex("b1_pre")) == 2.0)
    assert(r.getDouble(r.fieldIndex("b2_change")) == 0.0)
  }

  test("a planted downward kink under noise: b2 < 0 with |t| large") {
    val rows = (0 to 40).map { i =>
      val noise = (i * 37 % 11 - 5) * 0.01 // deterministic, small
      val y = 10.0 + 1.0 * i - 0.8 * math.max(0, i - 20) + noise
      ("a", i.toLong, y, 20L)
    }
    val r = fit(rows)("a")
    assert(r.getDouble(r.fieldIndex("b2_change")) < -0.7)
    assert(r.getDouble(r.fieldIndex("t_b2")) < -10.0)
  }

  test("singular designs yield NULL coefficients") {
    // all mass on one side of the break: z ≡ 0 → singular
    val oneSide = (0 to 9).map(i => ("flat", i.toLong, 1.0 * i, 20L))
    // too few points
    val tiny = Seq(("tiny", 0L, 1.0, 1L), ("tiny", 1L, 2.0, 1L),
      ("tiny", 2L, 3.0, 1L))
    val m = fit(oneSide ++ tiny)
    assert(m("flat").isNullAt(m("flat").fieldIndex("b2_change")))
    assert(m("tiny").isNullAt(m("tiny").fieldIndex("b0")))
  }

  test("group independence") {
    val a = (0 to 20).map { i =>
      ("a", i.toLong, 2.0 + 3.0 * i + 2.0 * math.max(0, i - 10), 10L)
    }
    val b = (0 to 30).map(i => ("b", i.toLong, (i * i).toDouble, 15L))
    val solo = fit(a)("a").getDouble(5)
    val both = fit(a ++ b)("a").getDouble(5)
    assert(solo == both)
  }
}
