package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.CliffsDelta

/** Cliff's delta (q224): exact dominance counting, tie neutrality,
  * the magnitude bands, empty-side NULL. Value-level oracle
  * equivalence runs through graft.Verify. */
class CliffsDeltaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def cd(rows: Seq[(Int, String, Long)]) = {
    import spark.implicits._
    CliffsDelta.cliffsDelta(
      rows.toDF("g", "cls", "v").repartition(4), "g", "cls", "X", "Y", "v")
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  test("full dominance is ±1 exactly, and direction follows the labels") {
    val up = cd(Seq((1, "X", 2L), (1, "Y", 1L)))(1)
    assert(up.getDouble(up.fieldIndex("cliffs_delta")) == 1.0)
    assert(up.getString(up.fieldIndex("magnitude")) == "large")
    val dn = cd(Seq((1, "X", 1L), (1, "Y", 2L)))(1)
    assert(dn.getDouble(dn.fieldIndex("cliffs_delta")) == -1.0)
  }

  test("ties contribute zero: identical samples read δ = 0, negligible") {
    val r = cd(Seq((1, "X", 1L), (1, "X", 2L), (1, "Y", 1L), (1, "Y", 2L)))(1)
    assert(r.getDouble(r.fieldIndex("cliffs_delta")) == 0.0)
    assert(r.getString(r.fieldIndex("magnitude")) == "negligible")
  }

  test("hand case: {2,3} vs {1,2} → 3 wins, 0 losses, 1 tie → δ = 0.75") {
    val r = cd(Seq((1, "X", 2L), (1, "X", 3L), (1, "Y", 1L), (1, "Y", 2L)))(1)
    assert(r.getDouble(r.fieldIndex("cliffs_delta")) == 0.75)
    assert(r.getString(r.fieldIndex("magnitude")) == "large")
  }

  test("band edges classify on the unrounded ratio") {
    // δ = 2/10 − 0 = ... build δ = 0.2: x = {2}, y five 1s and... use
    // gt=6, lt=4, n1n2=10? simpler: x={1,4}, y={2,3}: pairs (1,2)<,
    // (1,3)<, (4,2)>, (4,3)> → δ = 0 ... use x={3}, y={1,2,4,5}:
    // gt=2, lt=2 → 0. Take x={2,5}, y={1,3,4}: (2,1)> (2,3)< (2,4)<
    // (5,*)>>> → gt=4, lt=2, δ=2/6=0.333... → 'medium'
    val r = cd(Seq((1, "X", 2L), (1, "X", 5L),
      (1, "Y", 1L), (1, "Y", 3L), (1, "Y", 4L)))(1)
    assert(r.getDouble(r.fieldIndex("cliffs_delta")) == 0.333333)
    assert(r.getString(r.fieldIndex("magnitude")) == "medium")
  }

  test("an empty side is NULL") {
    val r = cd(Seq((1, "X", 1L), (1, "X", 2L)))(1)
    assert(r.isNullAt(r.fieldIndex("cliffs_delta")))
    assert(r.isNullAt(r.fieldIndex("magnitude")))
  }
}
