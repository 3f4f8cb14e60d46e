package graft

import org.scalatest.funsuite.AnyFunSuite

import operators.PropTest

class PropTestSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def run(rows: Seq[(Long, Int)]) =
    PropTest.propZTest(rows.toDF("u", "conv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8))).toSeq

  test("hand case: counts, proportions, and pooled z") {
    // A (even ids): units 2,4,6,8 — 2 convert; B (odd): 1,3,5,7 — 1 converts
    val rows = Seq(
      (2L, 1), (4L, 1), (6L, 0), (8L, 0),
      (1L, 1), (3L, 0), (5L, 0), (7L, 0))
    val Seq((na, xa, nb, xb, pa, pb, diff, z, p)) = run(rows)
    assert((na, xa, nb, xb) == (4L, 2L, 4L, 1L))
    assert(pa == 0.5 && pb == 0.25 && diff == 0.25)
    // pp = 3/8; se = sqrt(0.375*0.625*(1/4+1/4)) = sqrt(0.1171875)
    val se = math.sqrt(0.375 * 0.625 * 0.5)
    assert(math.abs(z - 0.25 / se) < 1e-3)
    assert(p > 0.4 && p < 0.5) // z ≈ 0.73 → p ≈ 0.465
  }

  test("identical rates: z = 0, p = 1") {
    val rows = Seq((2L, 1), (4L, 0), (1L, 1), (3L, 0))
    val Seq(t) = run(rows)
    assert(t._7 == 0.0 && t._8 == 0.0)
    assert(math.abs(t._9 - 1.0) < 1e-6)
  }

  test("saturated outcome: z NULL via nullif, not a crash") {
    val df = PropTest.propZTest(
      Seq((2L, 1), (1L, 1)).toDF("u", "conv"))
    val r = df.collect().head
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("real events A/A read: |z| small, p not tiny") {
    val df = PropTest.purchaseRateTest(spark, "/root/testdata/sf0.001")
    val r = df.collect().head
    val z = r.getDouble(7)
    assert(math.abs(z) < 3.5, s"hash-bucket A/A should not separate, z=$z")
    assert(r.getLong(0) > 0 && r.getLong(2) > 0)
  }
}
