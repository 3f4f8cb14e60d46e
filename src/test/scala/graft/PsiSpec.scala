package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Psi

class PsiSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  // rows: (segment, value, isCurrentPeriod)
  private def run(rows: Seq[(String, Double, Boolean)]) =
    Psi.psi(rows.toDF("g", "v", "cur"), "g", "v", "cur")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4))).sortBy(_._1).toSeq

  test("identical distributions: PSI = 0, stable") {
    val vals = (1 to 100).map(_.toDouble)
    val rows = vals.map(("s", _, false)) ++ vals.map(("s", _, true))
    val Seq((_, na, nb, psi, lvl)) = run(rows)
    assert((na, nb) == (100L, 100L))
    assert(psi == 0.0)
    assert(lvl == "stable")
  }

  test("hard shift: every current row above the baseline max → major") {
    val rows = (1 to 100).map(i => ("s", i.toDouble, false)) ++
      (1 to 100).map(i => ("s", 1000.0 + i, true))
    val Seq((_, _, _, psi, lvl)) = run(rows)
    assert(lvl == "major")
    // all current mass lands in bin 10: 9 bins with (0.1 - 1e-4)·ln(1000),
    // one bin with (0.1 - 1)·ln(0.1) — PSI is large
    assert(psi > 2.0)
  }

  test("mild reweighting lands between the thresholds") {
    // baseline uniform over 1..100; current oversamples the top half
    val rows = (1 to 100).map(i => ("m", i.toDouble, false)) ++
      ((1 to 25) ++ (51 to 125).map(i => 50 + (i - 50) % 50 + 1))
        .map(i => ("m", i.toDouble, true))
    val Seq((_, _, _, psi, _)) = run(rows)
    assert(psi > 0.0 && psi < 2.0)
  }

  test("segments are independent; one shifted segment flags alone") {
    val stable = (1 to 50).flatMap(i =>
      Seq(("ok", i.toDouble, false), ("ok", i.toDouble, true)))
    val shifted = (1 to 50).map(i => ("bad", i.toDouble, false)) ++
      (1 to 50).map(i => (("bad", 500.0 + i, true)))
    val got = run(stable ++ shifted)
    val by = got.map(t => t._1 -> t._5).toMap
    assert(by("ok") == "stable")
    assert(by("bad") == "major")
  }

  test("real orders: five priorities, PSI bounded, stationary feed stable") {
    val df = Psi.orderPricePsi(spark, "/root/testdata/sf0.001").cache()
    assert(df.count() == 5)
    assert(df.filter(col("psi") < 0.0).count() == 0)
    assert(df.filter(col("n_base") === 0 || col("n_current") === 0).count() == 0)
    // the synthetic price process does not drift across the split
    assert(df.filter(col("drift_level") === "major").count() == 0)
  }
}
