package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Grubbs

/** Grubbs (q214): exact hand-computed G, integer-election tie-break,
  * constant/short-group NULLs, group isolation. Value-level oracle
  * equivalence runs through graft.Verify. */
class GrubbsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def gr(rows: Seq[(Int, Long, Long)]) = {
    import spark.implicits._
    Grubbs.grubbs(rows.toDF("g", "t", "x").repartition(4))
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  test("hand case: x=(0,0,0,4) elects t=3 with G = 1.5 exactly") {
    // mean 1, sample var (3·1 + 9)/3 = 4, s = 2, G = |4−1|/2 = 1.5
    val r = gr(Seq((1, 0L, 0L), (1, 1L, 0L), (1, 2L, 0L), (1, 3L, 4L)))(1)
    assert(r.getLong(r.fieldIndex("t_out")) == 3L)
    assert(r.getLong(r.fieldIndex("x_out")) == 4L)
    assert(r.getDouble(r.fieldIndex("mean_x")) == 1.0)
    assert(r.getDouble(r.fieldIndex("g_stat")) == 1.5)
  }

  test("deviation ties elect the earliest key") {
    // x=(5,0,0,5): both extremes deviate |4x−10| = 10 — t=0 wins
    val r = gr(Seq((1, 0L, 5L), (1, 1L, 0L), (1, 2L, 0L), (1, 3L, 5L)))(1)
    assert(r.getLong(r.fieldIndex("t_out")) == 0L)
  }

  test("constant group: zero variance guards g_stat to NULL") {
    val r = gr(Seq((1, 0L, 7L), (1, 1L, 7L), (1, 2L, 7L)))(1)
    assert(r.isNullAt(r.fieldIndex("g_stat")))
  }

  test("n < 3 is NULL (G is undefined for a pair)") {
    val r = gr(Seq((1, 0L, 1L), (1, 1L, 9L)))(1)
    assert(r.isNullAt(r.fieldIndex("g_stat")))
    assert(r.getLong(r.fieldIndex("n_rows")) == 2L)
  }

  test("groups elect independently") {
    val m = gr(Seq((1, 0L, 0L), (1, 1L, 0L), (1, 2L, 0L), (1, 3L, 4L),
      (2, 0L, 10L), (2, 1L, 2L), (2, 2L, 2L), (2, 3L, 2L)))
    assert(m(1).getLong(m(1).fieldIndex("t_out")) == 3L)
    assert(m(2).getLong(m(2).fieldIndex("t_out")) == 0L)
    assert(m(2).getDouble(m(2).fieldIndex("g_stat")) == 1.5)
  }
}
