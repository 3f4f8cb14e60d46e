package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Cronbach

/** Cronbach's alpha (q183): perfect-scale α = 1, hand-computed item
  * table (α, item-dropped α, corrected item-total r), constant-item
  * behavior, dense-fill semantics, and degenerate NULLs. Value-level
  * oracle equivalence runs through graft.Verify. */
class CronbachSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def alpha(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    Cronbach.cronbach(rows.toDF("i", "j", "x").repartition(3))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("identical items: α = 1 exactly") {
    val rows = for (i <- 1L to 4L; j <- 1L to 3L) yield (i, j, i * 10L)
    val r = alpha(rows)(1L)
    assert(r.getDouble(r.fieldIndex("alpha")) == 1.0)
  }

  test("hand case: 3 items incl. a constant — α, α₋ⱼ, r from exact sums") {
    // x1 = (0,1,2,3), x2 = 2·x1, x3 ≡ 5: M = (20, 80, 0), M_tot = 180
    val rows = (1L to 4L).flatMap(i => Seq(
      (i, 1L, i - 1), (i, 2L, 2 * (i - 1)), (i, 3L, 5L)))
    val m = alpha(rows)
    val r1 = m(1L)
    assert(r1.getLong(r1.fieldIndex("n_cases")) == 4L)
    assert(r1.getLong(r1.fieldIndex("k_items")) == 3L)
    // α = 3/2 · (1 − 100/180)
    assert(r1.getDouble(r1.fieldIndex("alpha")) == 0.666667)
    // dropping the constant item recovers the 2-item scale: 2·(1−100/180)
    val r3 = m(3L)
    assert(r3.getDouble(r3.fieldIndex("alpha_dropped")) == 0.888889)
    // x1 vs (total − x1) = x2 + 5: perfectly correlated
    assert(r1.getDouble(r1.fieldIndex("r_item_total")) == 1.0)
    // the constant item correlates with nothing: 0/0 → NULL
    assert(r3.isNullAt(r3.fieldIndex("r_item_total")))
  }

  test("anti-correlated pair: total constant → var_total = 0 → NULL α") {
    val rows = (1L to 4L).flatMap(i => Seq((i, 1L, i), (i, 2L, 10L - i)))
    val r = alpha(rows)(1L)
    assert(r.isNullAt(r.fieldIndex("alpha")))
  }

  test("two items: α defined, α₋ⱼ needs k ≥ 3 → NULL") {
    val rows = (1L to 4L).flatMap(i => Seq((i, 1L, i - 1), (i, 2L, 2 * (i - 1))))
    val r = alpha(rows)(1L)
    assert(r.getDouble(r.fieldIndex("alpha")) == 0.888889)
    assert(r.isNullAt(r.fieldIndex("alpha_dropped")))
  }

  test("a missing cell is a true zero: explicit 0 row is equivalent") {
    val sparse = Seq((1L, 1L, 10L), (1L, 2L, 20L), (2L, 2L, 40L),
      (3L, 1L, 30L), (3L, 2L, 60L)) // (2, 1) absent
    val densed = sparse :+ (2L, 1L, 0L)
    val (a, b) = (alpha(sparse)(1L), alpha(densed)(1L))
    assert(a.getDouble(a.fieldIndex("alpha")) ==
      b.getDouble(b.fieldIndex("alpha")))
  }
}
