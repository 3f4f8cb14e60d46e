package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.KCore

/** k-core (q219): hand-peeled graphs, empty-core, the honest
  * converged flag under too few rounds, fixed-round ≡ fixed-point
  * parity. Value-level oracle equivalence runs through graft.Verify. */
class KCoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def arcs(und: Seq[(Long, Long)]) = {
    import spark.implicits._
    (und ++ und.map { case (a, b) => (b, a) })
      .toDF("src", "dst").repartition(4)
  }

  test("triangle + pendant at k=2: the pendant peels, the triangle stays") {
    val out = KCore.kCorePeel(
      arcs(Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L))), 2, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
  }

  test("triangle at k=3 peels to nothing") {
    assert(KCore.kCorePeel(
      arcs(Seq((0L, 1L), (1L, 2L), (2L, 0L))), 3, 2).count() == 0L)
  }

  test("converged flag is honest: a path needs more rounds than given") {
    // path of 8 at k=2 loses only its two endpoints per round —
    // after 1 round deg-1 ends remain, so converged must read false
    val path = (0L to 6L).map(i => (i, i + 1))
    val rows = KCore.kCorePeel(arcs(path), 2, 1).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(!_.getBoolean(2)))
    // with enough rounds the path peels to nothing
    assert(KCore.kCorePeel(arcs(path), 2, 4).count() == 0L)
  }

  test("fixed-point variant matches a converged fixed-round peel") {
    val g = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L), (3L, 4L))
    val (until, n) = KCore.kCoreUntil(arcs(g), 2)
    val fixedRows = KCore.kCorePeel(arcs(g), 2, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(until.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == fixedRows)
    assert(n >= 2) // two peels + the confirming stable round
  }
}
