package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Kuiper

/** Kuiper V (q229): full separation = 1, the symmetric middle-mass
  * case KS halves, cyclic-rotation invariance (the property the
  * operator exists for), identical → 0, empty-side NULL. Value-level
  * oracle equivalence runs through graft.Verify. */
class KuiperSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def kv(rows: Seq[(Int, String, Long)]) = {
    import spark.implicits._
    Kuiper.kuiperTest(
      rows.toDF("g", "cls", "v").repartition(4), "g", "cls", "X", "Y", "v")
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  test("identical samples read V = 0") {
    val r = kv(Seq((1, "X", 1L), (1, "X", 2L), (1, "Y", 1L), (1, "Y", 2L)))(1)
    assert(r.getDouble(r.fieldIndex("v_stat")) == 0.0)
  }

  test("full separation reads V = 1") {
    val r = kv(Seq((1, "X", 1L), (1, "X", 2L), (1, "Y", 8L), (1, "Y", 9L)))(1)
    assert(r.getDouble(r.fieldIndex("v_stat")) == 1.0)
  }

  test("mass pulled out of the middle: V = 1 where KS would read 0.5") {
    // x = {2} sits between y = {1, 3}: both one-sided gaps are 0.5
    // and Kuiper ADDS them — the tail-symmetric case KS halves
    val r = kv(Seq((1, "X", 2L), (1, "Y", 1L), (1, "Y", 3L)))(1)
    assert(r.getDouble(r.fieldIndex("v_stat")) == 1.0)
  }

  test("cyclic rotation of the support leaves V unchanged") {
    val base = kv(Seq((1, "X", 2L), (1, "Y", 1L), (1, "Y", 3L)))(1)
      .getDouble(3)
    // rotate {1,2,3} → {2,3,1}
    val rot = kv(Seq((1, "X", 3L), (1, "Y", 2L), (1, "Y", 1L)))(1)
      .getDouble(3)
    assert(base == rot)
  }

  test("an empty side is NULL") {
    val r = kv(Seq((1, "X", 1L), (1, "X", 2L)))(1)
    assert(r.isNullAt(r.fieldIndex("v_stat")))
  }
}
