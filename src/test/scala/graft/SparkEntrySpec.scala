package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: every registered query has exactly one
  * oracle (the gate compares keysets 1:1 — an orphan on either side is
  * a silent coverage hole), and the flagship entry returns rows. */
class SparkEntrySpec extends AnyFunSuite {

  test("queries ↔ oracleSql keysets are exactly 1:1") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).mkString(", ")}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).mkString(", ")}")
  }

  test("flagship entry smoke: rows > 0 on sf0.001") {
    assert(SparkEntry.entry(Engine.session()).count() > 0)
  }
}
