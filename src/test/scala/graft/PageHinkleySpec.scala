package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.PageHinkley

/** Page–Hinkley (q226): exact integer walk on a hand shift, both
  * directions with their peak days, earliest-tie election, flat-series
  * zero. Value-level oracle equivalence runs through graft.Verify. */
class PageHinkleySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def ph(rows: Seq[(Int, Long, Long)]) = {
    import spark.implicits._
    PageHinkley.pageHinkley(rows.toDF("g", "t", "x").repartition(4))
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  test("an upward step: drawup peaks at the end, drawdown mid-walk") {
    // x = (0,0,10,10): m' = (−20,−40,−20,0) → PH⁺ = 40/4 = 10 at day
    // 3, PH⁻ = 20/4 = 5 at day 1 — hand-exact integers throughout
    val r = ph(Seq((1, 0L, 0L), (1, 1L, 0L), (1, 2L, 10L), (1, 3L, 10L)))(1)
    assert(r.getDouble(r.fieldIndex("ph_up")) == 10.0)
    assert(r.getLong(r.fieldIndex("up_day")) == 3L)
    assert(r.getDouble(r.fieldIndex("ph_down")) == 5.0)
    assert(r.getLong(r.fieldIndex("down_day")) == 1L)
  }

  test("the mirrored step mirrors the sides") {
    val r = ph(Seq((1, 0L, 10L), (1, 1L, 10L), (1, 2L, 0L), (1, 3L, 0L)))(1)
    assert(r.getDouble(r.fieldIndex("ph_down")) == 10.0)
    assert(r.getLong(r.fieldIndex("down_day")) == 3L)
    assert(r.getDouble(r.fieldIndex("ph_up")) == 5.0)
  }

  test("a flat series reads zero evidence, elected at the earliest day") {
    val r = ph(Seq((1, 0L, 7L), (1, 1L, 7L), (1, 2L, 7L)))(1)
    assert(r.getDouble(r.fieldIndex("ph_up")) == 0.0)
    assert(r.getLong(r.fieldIndex("up_day")) == 0L)
  }

  test("groups walk independently") {
    val m = ph(Seq((1, 0L, 0L), (1, 1L, 0L), (1, 2L, 10L), (1, 3L, 10L),
      (2, 0L, 7L), (2, 1L, 7L), (2, 2L, 7L)))
    assert(m(1).getDouble(m(1).fieldIndex("ph_up")) == 10.0)
    assert(m(2).getDouble(m(2).fieldIndex("ph_up")) == 0.0)
  }
}
