package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.DecisionStump

/** Decision stump (q232): hand-computed impurity election, perfect
  * split, tie → earliest threshold, single-cell NULL. Value-level
  * oracle equivalence runs through graft.Verify. */
class DecisionStumpSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def st(rows: Seq[(Int, Long, Int)]) = {
    import spark.implicits._
    DecisionStump.stump(rows.toDF("g", "v", "y").repartition(4))
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  private def d(r: org.apache.spark.sql.Row, c: String): Double =
    r.getDouble(r.fieldIndex(c))

  test("a perfect split zeroes the impurity") {
    val r = st(Seq((1, 1L, 0), (1, 1L, 0), (1, 2L, 1), (1, 2L, 1)))(1)
    assert(r.getLong(r.fieldIndex("threshold")) == 1L)
    assert(d(r, "gini_before") == 0.5)
    assert(d(r, "gini_after") == 0.0)
    assert(d(r, "gini_gain") == 0.5)
  }

  test("hand case: v=1 wins with after = 0.316667, gain = 0.163333") {
    // cells: v1 (4 rows, 1 pos), v2 (2, 2), v3 (4, 3); before 0.48;
    // split@1 → 0.316667, split@2 → 0.45
    val rows = Seq.fill(3)((1, 1L, 0)) ++ Seq((1, 1L, 1)) ++
      Seq.fill(2)((1, 2L, 1)) ++ Seq((1, 3L, 0)) ++ Seq.fill(3)((1, 3L, 1))
    val r = st(rows)(1)
    assert(r.getLong(r.fieldIndex("threshold")) == 1L)
    assert(d(r, "gini_before") == 0.48)
    assert(d(r, "gini_after") == 0.316667)
    assert(d(r, "gini_gain") == 0.163333)
  }

  test("equal-impurity splits elect the earliest threshold") {
    // symmetric labels: splitting at 1 or at 2 is equally useless
    val r = st(Seq((1, 1L, 0), (1, 1L, 1), (1, 2L, 0), (1, 2L, 1),
      (1, 3L, 0), (1, 3L, 1)))(1)
    assert(r.getLong(r.fieldIndex("threshold")) == 1L)
    assert(d(r, "gini_gain") == 0.0)
  }

  test("a single value cell has no split: threshold NULL") {
    val r = st(Seq((1, 1L, 0), (1, 1L, 1)))(1)
    assert(r.isNullAt(r.fieldIndex("threshold")))
    assert(r.isNullAt(r.fieldIndex("gini_after")))
    assert(d(r, "gini_before") == 0.5)
  }

  test("groups elect independently") {
    val m = st(Seq((1, 1L, 0), (1, 1L, 0), (1, 2L, 1), (1, 2L, 1),
      (2, 1L, 0), (2, 1L, 1)))
    assert(m(1).getLong(m(1).fieldIndex("threshold")) == 1L)
    assert(m(2).isNullAt(m(2).fieldIndex("threshold")))
  }
}
