package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: every registered query has exactly one
  * oracle (the gate compares keysets 1:1 — an orphan on either side is
  * a silent coverage hole), and the flagship entry returns rows. */
class SparkEntrySpec extends AnyFunSuite {

  test("every oracle has a query; rows-only queries are exactly the documented set") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).mkString(", ")}")
    // rows-only rows (driver records the weaker rows-only check) are a
    // DELIBERATE, documented exception class — sequential graph builds
    // and the eigendecomposition audit have no SQL form (r16; the
    // rationale lives in SparkEntry comments + each module's scaladoc).
    // This list is a contract: adding a rows-only query without
    // extending it (and documenting why) fails the suite.
    val rowsOnly = Set("q312_ann_hnsw", "q313_hnsw_recall",
      "q319_opq_learned", "q323_ann_diskann", "q324_diskann_recall")
    assert((q -- o) == rowsOnly,
      s"undocumented rows-only queries: ${((q -- o) -- rowsOnly).mkString(", ")}" +
        s"; stale entries: ${(rowsOnly -- (q -- o)).mkString(", ")}")
  }

  test("flagship entry smoke: rows > 0 on sf0.001") {
    assert(SparkEntry.entry(Engine.session()).count() > 0)
  }
}
