package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.AndersonDarling

/** Two-sample AD (q215): exact hand-computed A² on tied and untied
  * micro-samples, identity → 0, label symmetry, empty-side NULL.
  * Value-level oracle equivalence runs through graft.Verify. */
class AndersonDarlingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def ad(rows: Seq[(Int, String, Long)]) = {
    import spark.implicits._
    AndersonDarling.adTest(
      rows.toDF("g", "cls", "v").repartition(4), "g", "cls", "X", "Y", "v")
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  test("minimal untied case {1} vs {2}: A² = 1 exactly") {
    // both cells contribute l·D*²/denom = 1; A² = 1/(1·1·2)·2 = 1
    val r = ad(Seq((1, "X", 1L), (1, "Y", 2L)))(1)
    assert(r.getDouble(r.fieldIndex("a2")) == 1.0)
  }

  test("tied case {1,1} vs {2}: A² = 2 exactly") {
    // cell 1: 2·2²/2 = 4, cell 2: 1·2²/2 = 2; A² = 2/(2·1·3)·6 = 2
    val r = ad(Seq((1, "X", 1L), (1, "X", 1L), (1, "Y", 2L)))(1)
    assert(r.getDouble(r.fieldIndex("a2")) == 2.0)
    assert(r.getLong(r.fieldIndex("n_x")) == 2L)
    assert(r.getLong(r.fieldIndex("n_y")) == 1L)
  }

  test("identical samples read exactly 0") {
    val r = ad(Seq((1, "X", 1L), (1, "X", 2L), (1, "Y", 1L), (1, "Y", 2L)))(1)
    assert(r.getDouble(r.fieldIndex("a2")) == 0.0)
  }

  test("A² is symmetric in the class labels") {
    val a = ad(Seq((1, "X", 1L), (1, "X", 5L), (1, "Y", 2L), (1, "Y", 9L)))(1)
      .getDouble(3)
    val b = ad(Seq((1, "Y", 1L), (1, "Y", 5L), (1, "X", 2L), (1, "X", 9L)))(1)
      .getDouble(3)
    assert(a == b)
  }

  test("an empty side is NULL, and separation beats overlap") {
    val m = ad(Seq((1, "X", 1L), (1, "X", 2L),
      (2, "X", 1L), (2, "X", 2L), (2, "Y", 8L), (2, "Y", 9L),
      (3, "X", 1L), (3, "X", 8L), (3, "Y", 2L), (3, "Y", 9L)))
    assert(m(1).isNullAt(m(1).fieldIndex("a2")))
    assert(m(2).getDouble(m(2).fieldIndex("a2")) >
      m(3).getDouble(m(3).fieldIndex("a2")))
  }
}
