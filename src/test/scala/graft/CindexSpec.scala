package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Cindex

/** Harrell's C-index (q186): perfect/reversed ranking, the ½ tie
  * credit, censoring comparability rules, a mixed hand case, and group
  * independence. Value-level oracle equivalence runs through
  * graft.Verify. */
class CindexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def c(rows: Seq[(String, Long, Int, Long)]) = {
    import spark.implicits._
    Cindex.cindex(rows.toDF("g", "dur", "event", "s").repartition(3))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("perfect risk ranking, no censoring: C = 1") {
    val m = c(Seq(("A", 1L, 1, 30L), ("A", 2L, 1, 20L), ("A", 3L, 1, 10L)))
    val r = m("A")
    assert(r.getLong(r.fieldIndex("n_pairs")) == 3L)
    assert(r.getLong(r.fieldIndex("c_micro")) == 1000000L)
  }

  test("perfectly wrong ranking: C = 0") {
    val m = c(Seq(("A", 1L, 1, 10L), ("A", 2L, 1, 20L), ("A", 3L, 1, 30L)))
    assert(m("A").getLong(m("A").fieldIndex("c_micro")) == 0L)
  }

  test("score tie takes half credit") {
    val m = c(Seq(("A", 1L, 1, 5L), ("A", 2L, 1, 5L)))
    val r = m("A")
    assert(r.getLong(r.fieldIndex("n_pairs")) == 1L)
    assert(r.getLong(r.fieldIndex("c_micro")) == 500000L)
  }

  test("a censored subject's 'event' never anchors a pair") {
    // censored at 1, event at 2: no subject outlives the event → 0 pairs
    val m = c(Seq(("A", 1L, 0, 10L), ("A", 2L, 1, 5L)))
    val r = m("A")
    assert(r.getLong(r.fieldIndex("n_pairs")) == 0L)
    assert(r.isNullAt(r.fieldIndex("c_micro")))
  }

  test("a later-censored partner IS comparable against an earlier event") {
    val m = c(Seq(("A", 1L, 1, 30L), ("A", 2L, 0, 10L)))
    assert(m("A").getLong(m("A").fieldIndex("n_pairs")) == 1L)
    assert(m("A").getLong(m("A").fieldIndex("c_micro")) == 1000000L)
  }

  test("mixed hand case: 2 concordant of 3 comparable → 666666") {
    val m = c(Seq(("A", 1L, 1, 3L), ("A", 2L, 1, 1L), ("A", 3L, 0, 2L)))
    val r = m("A")
    assert(r.getLong(r.fieldIndex("n_pairs")) == 3L)
    assert(r.getLong(r.fieldIndex("c_micro")) == 666666L)
  }

  test("equal times are not comparable (neither direction)") {
    val m = c(Seq(("A", 5L, 1, 30L), ("A", 5L, 1, 10L), ("A", 5L, 0, 20L)))
    assert(m("A").getLong(m("A").fieldIndex("n_pairs")) == 0L)
  }

  test("groups are independent") {
    val solo = c(Seq(("A", 1L, 1, 3L), ("A", 2L, 1, 1L), ("A", 3L, 0, 2L)))
    val joint = c(Seq(("A", 1L, 1, 3L), ("A", 2L, 1, 1L), ("A", 3L, 0, 2L),
      ("B", 1L, 1, 1L), ("B", 2L, 1, 9L)))
    assert(joint("A").getLong(4) == solo("A").getLong(4))
    assert(joint("B").getLong(joint("B").fieldIndex("c_micro")) == 0L)
  }
}
