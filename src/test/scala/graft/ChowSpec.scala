package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Chow

/** Chow test (q222): hand-computed F on a same-regime and a genuine
  * two-regime series, exact-fit NULL, short-side NULL. Value-level
  * oracle equivalence runs through graft.Verify. */
class ChowSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def chow(pts: Seq[(Long, Double)], tb: Long) = {
    import spark.implicits._
    Chow.chow(pts.map { case (x, y) => (1, x, y, tb) }
      .toDF("g", "x", "y", "tb").repartition(4))
      .collect().head
  }

  private def d(r: org.apache.spark.sql.Row, c: String): Double =
    r.getDouble(r.fieldIndex(c))

  test("same regime both sides: F = 0.1088 on the hand case") {
    // y = x with the SAME one-point bump in each half: split SSR
    // 0.7 + 0.7 = 1.4, pooled 1.4762, F = (0.0762/2)/(1.4/4)
    val pts = (0L to 7L).map(x => (x,
      if (x == 1L) 2.0 else if (x == 5L) 6.0 else x.toDouble))
    val r = chow(pts, 3L)
    assert(d(r, "ssr_split") == 1.4)
    assert(d(r, "ssr_pooled") == 1.4762)
    assert(d(r, "f_chow") == 0.1088)
  }

  test("a genuine level jump reads F = 50.381") {
    val pts = Seq((0L, 0.0), (1L, 1.0), (2L, 0.0), (3L, 1.0),
      (4L, 10.0), (5L, 11.0), (6L, 10.0), (7L, 11.0))
    val r = chow(pts, 3L)
    assert(d(r, "f_chow") == 50.381)
  }

  test("an exact two-line fit is NULL (infinite evidence, 0 denominator)") {
    val pts = (0L to 3L).map(x => (x, x.toDouble)) ++
      (4L to 7L).map(x => (x, 100.0 - x))
    val r = chow(pts, 3L)
    assert(r.isNullAt(r.fieldIndex("f_chow")))
    assert(d(r, "ssr_split") == 0.0)
  }

  test("a side with fewer than 3 points cannot fit: NULL") {
    val pts = Seq((0L, 1.0), (1L, 3.0), (2L, 2.0), (3L, 5.0), (4L, 4.0))
    val r = chow(pts, 0L) // pre side has a single point
    assert(r.isNullAt(r.fieldIndex("f_chow")))
  }
}
