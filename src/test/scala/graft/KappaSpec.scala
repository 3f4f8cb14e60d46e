package graft

import org.scalatest.funsuite.AnyFunSuite

import operators.Kappa

class KappaSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def run(rows: Seq[(Int, Int)]) = {
    val r = Kappa.cohenKappa(rows.toDF("x", "y"), "x = 1", "y = 1").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getDouble(5), r.getDouble(6),
      if (r.isNullAt(7)) Double.NaN else r.getDouble(7))
  }

  test("perfect agreement: kappa = 1") {
    val rows = Seq((1, 1), (1, 1), (0, 0), (0, 0), (1, 1), (0, 0))
    val t = run(rows)
    assert(t._6 == 1.0)
    assert(t._8 == 1.0)
  }

  test("hand 2x2: textbook kappa") {
    // n11=20, n00=15, n10=5, n01=10 → n=50, po=0.7
    // r1=25, c1=30; pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.4
    val rows = List.fill(20)((1, 1)) ++ List.fill(15)((0, 0)) ++
      List.fill(5)((1, 0)) ++ List.fill(10)((0, 1))
    val t = run(rows)
    assert((t._1, t._2, t._3, t._4, t._5) == (50L, 20L, 15L, 25L, 30L))
    assert(t._6 == 0.7 && t._7 == 0.5)
    assert(t._8 == 0.4)
  }

  test("independent labelers with same margins: kappa ≈ 0") {
    // x alternates, y alternates at double period → half agree
    val rows = (0 until 40).map(i => (i % 2, (i / 2) % 2))
    val t = run(rows)
    assert(math.abs(t._8) < 1e-9)
  }

  test("constant labelers: pe = 1 → kappa NULL, not 0/0") {
    val rows = Seq((1, 1), (1, 1), (1, 1))
    val t = run(rows)
    assert(t._6 == 1.0 && t._7 == 1.0)
    assert(t._8.isNaN)
  }

  test("chance-inflated raw agreement gets corrected down") {
    // 90% prevalence on both sides: high po, high pe
    val rows = List.fill(81)((1, 1)) ++ List.fill(9)((1, 0)) ++
      List.fill(9)((0, 1)) ++ List.fill(1)((0, 0))
    val t = run(rows)
    assert(t._6 > 0.8)      // raw agreement looks great
    assert(t._8 < 0.1)      // kappa exposes it as chance-level
  }

  test("real lineitem: cells sum to n, kappa in [-1, 1]") {
    val r = Kappa.lineitemKappa(spark, "/root/testdata/sf0.001").head()
    val (n, n11, n00, r1, c1) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    assert(n11 <= r1.min(c1))
    assert(n00 <= (n - r1).min(n - c1))
    val k = r.getDouble(7)
    assert(k >= -1.0 && k <= 1.0)
  }
}
