package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Winsorize

class WinsorizeSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def run(rows: Seq[(String, Double)], pPct: Int = 5) =
    Winsorize.winsorizedMean(rows.toDF("g", "v"), "g", "v", pPct)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).sortBy(_._1).toSeq

  test("hand case: one outlier is clamped to the 95th order statistic") {
    // 20 values 1..19 and 1000; p=5 → lo = 1st order stat (1),
    // hi = 19th order stat (19); winsorized sum = (1..19) + 19 = 209
    val rows = ((1 to 19).map(i => ("a", i.toDouble)) :+ ("a", 1000.0))
    val got = run(rows)
    val (_, n, lo, hi, raw, w) = got.head
    assert(n == 20L)
    assert(lo == 1.0 && hi == 19.0)
    assert(raw == (190.0 + 1000.0) / 20)
    assert(w == 209.0 / 20)
  }

  test("no tail mass: winsorized mean equals raw mean on tight data") {
    // 10 identical values — clamping is a no-op
    val got = run((1 to 10).map(_ => ("b", 7.5)))
    assert(got.head._5 == got.head._6)
    assert(got.head._3 == 7.5 && got.head._4 == 7.5)
  }

  test("both tails clamp symmetrically at p=25") {
    // values 1,2,3,4: lo = ceil(.25*4)=1st (1), hi = ceil(.75*4)=3rd (3)
    // winsorized: 1,2,3,3 → mean 2.25
    val got = run(Seq(("c", 1.0), ("c", 2.0), ("c", 3.0), ("c", 4.0)), pPct = 25)
    assert(got.head._3 == 1.0 && got.head._4 == 3.0)
    assert(got.head._6 == 2.25)
  }

  test("groups are independent") {
    val rows = (1 to 20).map(i => ("x", i.toDouble)) ++
      (1 to 20).map(i => ("y", i * 100.0))
    val got = run(rows)
    assert(got.map(_._1) == Seq("x", "y"))
    assert(got(1)._4 == got(0)._4 * 100)
  }

  test("real lineitem: winsorized pulls toward the center, bounds ordered") {
    val df = Winsorize.lineitemWinsorized(spark, "/root/testdata/sf0.001").cache()
    assert(df.count() == 3)
    assert(df.filter(col("lo_bound") > col("hi_bound")).count() == 0)
    // clamping can only reduce the spread around the mean; with a
    // right-skewed price distribution winsorized ≤ raw is not
    // guaranteed per se, but bounds must straddle both means
    assert(df.filter(col("winsorized_mean") < col("lo_bound") ||
      col("winsorized_mean") > col("hi_bound")).count() == 0)
  }
}
