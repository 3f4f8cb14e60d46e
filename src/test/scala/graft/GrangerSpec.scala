package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Granger

/** Granger causality (q211): exact cross-driven and pure-AR hand
  * cases, a noisy planted-signal t, and the singular guard.
  * Value-level oracle equivalence runs through graft.Verify. */
class GrangerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def granger(xs: Seq[Double], ys: Seq[Double]) = {
    import spark.implicits._
    Granger.grangerTest(
      xs.indices.map(i => (i.toLong, xs(i), ys(i)))
        .toDF("w", "xs", "ys").repartition(4))
      .collect().head
  }

  test("y driven exactly by lagged x: c = 1, b = 0, exact fit") {
    // ys_t = xs_{t-1}: the cross lag explains y completely
    val xs = Seq(1.0, 5.0, 2.0, 7.0, 3.0, 8.0, 4.0)
    val ys = 0.0 +: xs.dropRight(1)
    val r = granger(xs, ys)
    assert(r.getDouble(r.fieldIndex("c_xlag")) == 1.0)
    assert(r.getDouble(r.fieldIndex("b_ylag")) == 0.0)
    assert(r.getDouble(r.fieldIndex("se_cx")) == 0.0)
    assert(r.isNullAt(r.fieldIndex("t_granger")))
  }

  test("pure AR ramp: b = 1, c = 0 exactly — x adds nothing") {
    val r = granger(Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0),
      Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    assert(r.getDouble(r.fieldIndex("b_ylag")) == 1.0)
    assert(r.getDouble(r.fieldIndex("c_xlag")) == 0.0)
    assert(r.isNullAt(r.fieldIndex("t_granger")))
  }

  test("planted noisy cross-signal: t ≈ 44.6, p ~ 0") {
    // ys_t = 2·xs_{t-1} ± 0.5 alternating: c ≈ 1.965, t ≈ 44.58
    val xs = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7).map(_.toDouble)
    val noise = Seq(0, 1, -1, 0, 1, -1, 0, 1, -1, 0, 1, -1, 0, 1)
    val ys = 0.0 +: xs.dropRight(1).zip(noise.drop(1))
      .map { case (x, e) => 2.0 * x + 0.5 * e }
    val r = granger(xs, ys)
    assert(r.getLong(r.fieldIndex("n_weeks")) == 13L)
    val t = r.getDouble(r.fieldIndex("t_granger"))
    assert(t > 44.0 && t < 45.0)
    assert(r.getDouble(r.fieldIndex("p_approx")) == 0.0)
    val c = r.getDouble(r.fieldIndex("c_xlag"))
    assert(c > 1.96 && c < 1.97)
  }

  test("constant x is collinear with the intercept: NULLs") {
    val r = granger(Seq.fill(7)(4.0),
      Seq(0.0, 2.0, 1.0, 3.0, 2.0, 4.0, 3.0))
    assert(r.isNullAt(r.fieldIndex("c_xlag")))
    assert(r.isNullAt(r.fieldIndex("t_granger")))
  }
}
