package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.BlandAltman

/** Bland–Altman (q230): exact bias/limits on a hand outlier case,
  * perfect-agreement zero, degenerate NULLs. Value-level oracle
  * equivalence runs through graft.Verify. */
class BlandAltmanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def ba(pairs: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    BlandAltman.blandAltman(pairs.toDF("k", "a", "b").repartition(4))
      .collect().head
  }

  private def d(r: org.apache.spark.sql.Row, c: String): Double =
    r.getDouble(r.fieldIndex(c))

  test("one big discrepancy: exact bias, limits, and the outside queue") {
    // diffs = 1×9, 101: bias 11, sd = √1000 = 31.6228,
    // LoA = 11 ± 1.959963985·√1000 = (−50.9795, 72.9795), 101 outside
    val pairs = (1L to 9L).map(k => (k, k + 1, k)) :+ (10L, 111L, 10L)
    val r = ba(pairs)
    assert(d(r, "bias") == 11.0)
    assert(d(r, "sd_diff") == 31.6228)
    assert(d(r, "loa_low") == -50.9795)
    assert(d(r, "loa_high") == 72.9795)
    assert(r.getLong(r.fieldIndex("n_outside")) == 1L)
    assert(d(r, "pct_outside") == 0.1)
  }

  test("perfect agreement: zero bias, zero-variance limits are NULL") {
    val r = ba(Seq((1L, 5L, 5L), (2L, 7L, 7L), (3L, 9L, 9L)))
    assert(d(r, "bias") == 0.0)
    assert(r.isNullAt(r.fieldIndex("sd_diff")))
    assert(r.getLong(r.fieldIndex("n_outside")) == 0L)
  }

  test("constant bias with no spread: bias reported, limits NULL") {
    val r = ba(Seq((1L, 15L, 5L), (2L, 17L, 7L)))
    assert(d(r, "bias") == 10.0)
    assert(r.isNullAt(r.fieldIndex("loa_high")))
  }

  test("a single pair cannot bound anything: limits NULL") {
    val r = ba(Seq((1L, 5L, 3L)))
    assert(d(r, "bias") == 2.0)
    assert(r.isNullAt(r.fieldIndex("sd_diff")))
  }
}
