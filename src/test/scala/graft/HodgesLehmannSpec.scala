package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.HodgesLehmann

/** Hodges–Lehmann shift (q231): exact cross-difference medians incl.
  * the even-count split middle, shift equivariance, empty-side NULL.
  * Value-level oracle equivalence runs through graft.Verify. */
class HodgesLehmannSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def hl(rows: Seq[(Int, String, Long)]) = {
    import spark.implicits._
    HodgesLehmann.hlShift(
      rows.toDF("g", "cls", "v").repartition(4), "g", "cls", "X", "Y", "v")
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  test("single pair: the shift is the difference") {
    val r = hl(Seq((1, "X", 5L), (1, "Y", 1L)))(1)
    assert(r.getDouble(r.fieldIndex("hl_shift")) == 4.0)
  }

  test("identical samples read 0") {
    val r = hl(Seq((1, "X", 1L), (1, "X", 2L), (1, "Y", 1L), (1, "Y", 2L)))(1)
    assert(r.getDouble(r.fieldIndex("hl_shift")) == 0.0)
  }

  test("even count splits the middle: {0,10}−{0} → (0+10)/2 = 5") {
    val r = hl(Seq((1, "X", 0L), (1, "X", 10L), (1, "Y", 0L)))(1)
    assert(r.getDouble(r.fieldIndex("hl_shift")) == 5.0)
  }

  test("a constant shift moves HL by exactly that shift") {
    val base = hl(Seq((1, "X", 3L), (1, "X", 7L), (1, "X", 9L),
      (1, "Y", 1L), (1, "Y", 4L)))(1).getDouble(3)
    val moved = hl(Seq((1, "X", 13L), (1, "X", 17L), (1, "X", 19L),
      (1, "Y", 1L), (1, "Y", 4L)))(1).getDouble(3)
    assert(moved == base + 10.0)
  }

  test("weights multiply: duplicated values change nothing") {
    val once = hl(Seq((1, "X", 2L), (1, "Y", 1L), (1, "Y", 3L)))(1)
      .getDouble(3)
    val dup = hl(Seq((1, "X", 2L), (1, "X", 2L),
      (1, "Y", 1L), (1, "Y", 1L), (1, "Y", 3L), (1, "Y", 3L)))(1)
      .getDouble(3)
    assert(once == dup)
  }

  test("an empty side is NULL") {
    val r = hl(Seq((1, "X", 1L)))(1)
    assert(r.isNullAt(r.fieldIndex("hl_shift")))
  }
}
