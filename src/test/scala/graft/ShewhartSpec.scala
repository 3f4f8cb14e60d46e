package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Shewhart

/** Shewhart x̄ chart (q236): hand-exact within-SS pooling, a 3σ+
  * shifted week flags while in-control weeks don't, constant-data
  * NULLs, group isolation. Value-level oracle equivalence runs
  * through graft.Verify. */
class ShewhartSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  // a 7-day week with mean m and within-SS exactly 18: (m−3, m+3, m×5)
  private def week(g: Int, w: Long, m: Long): Seq[(Int, Long, Long)] =
    Seq((g, w * 7, m - 3), (g, w * 7 + 1, m + 3)) ++
      (2L to 6L).map(d => (g, w * 7 + d, m))

  private def chart(rows: Seq[(Int, Long, Long)]) = {
    import spark.implicits._
    Shewhart.xbarChart(rows.toDF("g", "t", "x").repartition(4))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r).toMap
  }

  test("a +2.5 shifted week flags at z = 3.8188; in-control weeks don't") {
    // 5 weeks at mean 10 + 1 at 13: s_p² = 6·18/36 = 3 exactly,
    // center = 441/42 = 10.5, z_normal = −0.5/(√3/√7) = −0.7638,
    // z_shift = 2.5/0.654654 = 3.8188
    val m = chart((0L to 4L).flatMap(w => week(1, w, 10L)) ++ week(1, 5L, 13L))
    val normal = m((1, 0L))
    assert(normal.getDouble(normal.fieldIndex("center")) == 10.5)
    assert(normal.getDouble(normal.fieldIndex("z")) == -0.7638)
    assert(!normal.getBoolean(normal.fieldIndex("flagged")))
    val hot = m((1, 5L))
    assert(hot.getDouble(hot.fieldIndex("z")) == 3.8188)
    assert(hot.getBoolean(hot.fieldIndex("flagged")))
  }

  test("constant data has no within spread: z and flag are NULL") {
    val m = chart((0L to 13L).map(t => (1, t, 10L)))
    assert(m((1, 0L)).isNullAt(m((1, 0L)).fieldIndex("z")))
    assert(m((1, 0L)).isNullAt(m((1, 0L)).fieldIndex("flagged")))
  }

  test("groups chart independently") {
    val m = chart(
      (0L to 4L).flatMap(w => week(1, w, 10L)) ++ week(1, 5L, 13L) ++
        (0L to 5L).flatMap(w => week(2, w, 10L)))
    assert(m((1, 5L)).getBoolean(m((1, 5L)).fieldIndex("flagged")))
    assert(!m((2, 5L)).getBoolean(m((2, 5L)).fieldIndex("flagged")))
  }
}
