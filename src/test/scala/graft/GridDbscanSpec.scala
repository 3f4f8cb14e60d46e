package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.GridDbscan

/** Grid-density clustering (q208): two planted blobs separate, the
  * 8-connectivity diagonal merge, the minPts floor, and singleton
  * dense cells. Value-level oracle equivalence runs through
  * graft.Verify. */
class GridDbscanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private val W = 1000L // 1000-µdeg test cells

  /** n points inside cell (cx, cy) (offset coordinates). */
  private def fill(cx: Long, cy: Long, n: Int): Seq[(Long, Long)] =
    (0 until n).map(i => (cx * W - GridDbscan.LatOff + i % 7,
      cy * W - GridDbscan.LonOff + i % 5))

  private def run(pts: Seq[(Long, Long)], minPts: Long = 3L) = {
    import spark.implicits._
    GridDbscan.gridDbscan(pts.toDF("px", "py").repartition(5), W, minPts)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("two separated blobs come out as two clusters with exact counts") {
    val a = fill(10, 10, 5) ++ fill(10, 11, 4) // 2-cell cluster, 9 pts
    val b = fill(50, 50, 3)                    // 1-cell cluster, 3 pts
    val m = run(a ++ b)
    assert(m.size == 2)
    assert(m(10L * 1000000 + 10) == (2L, 9L))
    assert(m(50L * 1000000 + 50) == (1L, 3L))
  }

  test("8-connectivity: a diagonal neighbor joins the cluster") {
    val m = run(fill(10, 10, 3) ++ fill(11, 11, 3))
    assert(m.size == 1)
    assert(m(10L * 1000000 + 10) == (2L, 6L))
  }

  test("cells under minPts are noise and never bridge two clusters") {
    // a 2-point cell BETWEEN two dense cells does not connect them
    val m = run(fill(10, 10, 3) ++ fill(10, 11, 2) ++ fill(10, 12, 3))
    assert(m.size == 2)
    assert(m.keySet == Set(10L * 1000000 + 10, 10L * 1000000 + 12))
  }

  test("a lone dense cell is its own cluster") {
    val m = run(fill(7, 7, 4))
    assert(m == Map(7L * 1000000 + 7 -> (1L, 4L)))
  }
}
