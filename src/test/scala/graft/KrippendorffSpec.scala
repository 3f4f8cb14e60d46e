package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Krippendorff

/** Krippendorff's α (q227): the classic exact anchors (perfect 1,
  * chance 0, systematic −0.5), ragged-panel value, singleton
  * accounting, all-same NULL. Value-level oracle equivalence runs
  * through graft.Verify. */
class KrippendorffSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def a(rows: Seq[(Int, Long, String)]) = {
    import spark.implicits._
    Krippendorff.alpha(rows.toDF("g", "u", "c").repartition(4))
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  test("perfect within-unit agreement: α = 1") {
    val r = a(Seq((1, 1L, "a"), (1, 1L, "a"), (1, 2L, "b"), (1, 2L, "b")))(1)
    assert(r.getDouble(r.fieldIndex("alpha")) == 1.0)
  }

  test("chance-level mix: α = 0 exactly") {
    val r = a(Seq((1, 1L, "a"), (1, 1L, "a"), (1, 2L, "a"), (1, 2L, "b")))(1)
    assert(r.getDouble(r.fieldIndex("alpha")) == 0.0)
  }

  test("systematic disagreement: the classic −0.5") {
    val r = a(Seq((1, 1L, "a"), (1, 1L, "b"), (1, 2L, "a"), (1, 2L, "b")))(1)
    assert(r.getDouble(r.fieldIndex("alpha")) == -0.5)
  }

  test("ragged panels (sizes 3 and 2) both contribute: α = −1/3") {
    // Do = 0.8, De = 0.6 → α = 1 − 4/3 — the design Fleiss' complete-
    // panel filter would truncate
    val r = a(Seq((1, 1L, "a"), (1, 1L, "a"), (1, 1L, "b"),
      (1, 2L, "a"), (1, 2L, "b")))(1)
    assert(r.getDouble(r.fieldIndex("alpha")) == -0.333333)
    assert(r.getLong(r.fieldIndex("n_vals")) == 5L)
  }

  test("singleton units carry no pairs: excluded and counted") {
    val withS = a(Seq((1, 1L, "a"), (1, 1L, "a"), (1, 2L, "b"), (1, 2L, "b"),
      (1, 3L, "b")))(1)
    assert(withS.getLong(withS.fieldIndex("n_singletons")) == 1L)
    assert(withS.getLong(withS.fieldIndex("n_units")) == 2L)
    assert(withS.getDouble(withS.fieldIndex("alpha")) == 1.0)
  }

  test("one value everywhere: De = 0 → NULL") {
    val r = a(Seq((1, 1L, "a"), (1, 1L, "a"), (1, 2L, "a"), (1, 2L, "a")))(1)
    assert(r.isNullAt(r.fieldIndex("alpha")))
  }
}
