package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Skyline

/** Skyline (q291): brute-force dominance cross-check, tie semantics
  * (strictness in one coordinate), and the registered frontier's
  * dominance invariant. Value-level oracle equivalence runs through
  * graft.Verify. */
class SkylineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def sky(cells: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    Skyline.skyline2d(
      cells.map { case (x, y, n) => ("g", x, y, n) }
        .toDF("g", "x", "y", "n").repartition(4))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
  }

  /** Brute-force skyline: p dominated iff ∃q: qx ≤ px ∧ qy ≥ py with
    * one strict. */
  private def brute(cells: Seq[(Long, Long)]): Set[(Long, Long)] =
    cells.filter { case (px, py) =>
      !cells.exists { case (qx, qy) =>
        qx <= px && qy >= py && (qx < px || qy > py)
      }
    }.toSet

  test("matches brute force on a scattered grid") {
    val pts = Seq((1L, 5L), (2L, 9L), (2L, 4L), (3L, 9L), (3L, 12L),
      (4L, 1L), (5L, 15L), (5L, 14L), (6L, 15L), (7L, 2L))
    assert(sky(pts.map(p => (p._1, p._2, 1L))) == brute(pts))
  }

  test("equal x keeps only the max y; equal y keeps only the min x") {
    val pts = Seq((1L, 10L), (1L, 8L), (3L, 10L), (4L, 12L))
    // (1,8) dominated by (1,10); (3,10) dominated by (1,10)
    assert(sky(pts.map(p => (p._1, p._2, 1L))) == Set((1L, 10L), (4L, 12L)))
  }

  test("a single point is its own skyline") {
    assert(sky(Seq((5L, 5L, 3L))) == Set((5L, 5L)))
  }

  test("monotone staircase survives whole") {
    val pts = (1L to 5L).map(i => (i, i * 10L, 1L))
    assert(sky(pts) == pts.map(p => (p._1, p._2)).toSet)
  }

  test("registered frontier: no row dominates another within a segment") {
    val rows = Skyline.segmentValueFrontier(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (seg, rs) =>
      val pts = rs.map(r => (r.getLong(1), r.getLong(2)))
      assert(brute(pts.toSeq) == pts.toSet, s"segment $seg")
      // frontier is strictly increasing in both coordinates once sorted
      val sorted = pts.sortBy(_._1)
      assert(sorted.zip(sorted.tail).forall { case (a, b) =>
        a._1 < b._1 && a._2 < b._2
      }, s"segment $seg staircase")
    }
  }
}
