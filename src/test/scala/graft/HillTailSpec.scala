package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.HillTail

/** Hill tail index (q188): geometric-tail hand case, exact boundary
  * splitting of a straddling value cell, the all-equal-tail NULL, and
  * group independence. Value-level oracle equivalence runs through
  * graft.Verify. */
class HillTailSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def hill(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    HillTail.hillTail(rows.toDF("g", "x").repartition(3))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("geometric tail: Hill = mean of j·ln2 = 4.5·ln2") {
    // 12 values, k_tail = max(12 div 100, 10) = 10: top 10 are
    // 1000·2^0..2^9, two below-tail stragglers
    val rows = (0 to 9).map(j => ("A", 1000L << j)) ++
      Seq(("A", 3L), ("A", 7L))
    val r = hill(rows)("A")
    assert(r.getLong(r.fieldIndex("k_tail")) == 10L)
    assert(r.getLong(r.fieldIndex("x_k")) == 1000L)
    assert(math.abs(r.getDouble(r.fieldIndex("hill")) -
      4.5 * math.log(2.0)) < 2e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("alpha")) -
      1.0 / (4.5 * math.log(2.0))) < 2e-6)
  }

  test("a cell straddling the k-boundary contributes exactly its share") {
    // 5×4000 then 8×1000 (n = 13, k = 10): the 1000-cell contributes
    // only 5 of its 8 → Hill = 5·ln4 / 10
    val rows = Seq.fill(5)(("A", 4000L)) ++ Seq.fill(8)(("A", 1000L))
    val r = hill(rows)("A")
    assert(r.getLong(r.fieldIndex("x_k")) == 1000L)
    assert(math.abs(r.getDouble(r.fieldIndex("hill")) -
      0.5 * math.log(4.0)) < 2e-6)
  }

  test("an all-equal tail is degenerate: NULL, not zero-divide") {
    val r = hill(Seq.fill(15)(("A", 500L)))("A")
    assert(r.isNullAt(r.fieldIndex("hill")))
    assert(r.isNullAt(r.fieldIndex("alpha")))
  }

  test("groups are independent") {
    val solo = hill((0 to 9).map(j => ("A", 1000L << j)))
    val joint = hill((0 to 9).map(j => ("A", 1000L << j)) ++
      Seq.fill(15)(("B", 42L)))
    assert(joint("A").getDouble(solo("A").fieldIndex("hill")) ==
      solo("A").getDouble(solo("A").fieldIndex("hill")))
    assert(joint("B").isNullAt(joint("B").fieldIndex("hill")))
  }
}
