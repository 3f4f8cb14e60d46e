package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Yuen

/** Yuen trimmed t (q194): the no-trim Welch reduction, outlier
  * immunity (the motivating property), trim-boundary cell splitting,
  * and degenerate NULLs. Value-level oracle equivalence runs through
  * graft.Verify. */
class YuenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def yuen(a: Seq[Long], b: Seq[Long]) = {
    import spark.implicits._
    val cells = (a.map(v => ("G", v, 1L, 0L)) ++ b.map(v => ("G", v, 0L, 1L)))
      .toDF("g", "v", "cx", "cy")
      .groupBy("g", "v")
      .agg(org.apache.spark.sql.functions.expr("sum(cx) AS cx"),
        org.apache.spark.sql.functions.expr("sum(cy) AS cy"))
    Yuen.yuenFromCells(cells).collect().head
  }

  test("n < 5 trims nothing: reduces to Welch on the raw values") {
    // A = {10,20,30}, B = {40,50,60}: t = −30/√(200/3), df = 4
    val r = yuen(Seq(10L, 20L, 30L), Seq(40L, 50L, 60L))
    assert(r.getLong(r.fieldIndex("h_a")) == 3L)
    assert(r.getDouble(r.fieldIndex("tmean_a")) == 20.0)
    assert(r.getDouble(r.fieldIndex("t_yuen")) == -3.6742)
    assert(r.getDouble(r.fieldIndex("df_yuen")) == 4.0)
  }

  test("a whale in the tail cannot move the statistic") {
    val base = yuen(Seq(10L, 10L, 10L, 10L, 11L), Seq(10L, 15L, 20L, 25L, 30L))
    val whaled = yuen(Seq(10L, 10L, 10L, 10L, 999999L),
      Seq(10L, 15L, 20L, 25L, 30L))
    assert(base.getDouble(base.fieldIndex("t_yuen")) ==
      whaled.getDouble(whaled.fieldIndex("t_yuen")))
    assert(whaled.getDouble(whaled.fieldIndex("tmean_a")) == 10.0)
  }

  test("hand case with winsorized variance: t = −10/√(50/3)") {
    // A = {10,10,10,10,11} → kept {10,10,10}, clamps 10/10, d_a = 0
    // B = {10,15,20,25,30} → kept {15,20,25}, clamps 15/25,
    //   sw = 100, qw = 2100, d_b = (2100 − 2000)/6
    val r = yuen(Seq(10L, 10L, 10L, 10L, 11L), Seq(10L, 15L, 20L, 25L, 30L))
    assert(r.getLong(r.fieldIndex("h_b")) == 3L)
    assert(r.getDouble(r.fieldIndex("tmean_b")) == 20.0)
    val expT = -10.0 / math.sqrt(100.0 / 6.0)
    assert(math.abs(r.getDouble(r.fieldIndex("t_yuen")) - expT) < 1e-3)
  }

  test("one repeated value straddles both trim boundaries exactly") {
    // A = 5 copies of 7: the single cell keeps m = 3 of 5
    val r = yuen(Seq(7L, 7L, 7L, 7L, 7L), Seq(10L, 15L, 20L, 25L, 30L))
    assert(r.getLong(r.fieldIndex("h_a")) == 3L)
    assert(r.getDouble(r.fieldIndex("tmean_a")) == 7.0)
  }

  test("both sides degenerate after winsorizing: NULL, not a blowup") {
    val r = yuen(Seq(5L, 5L, 5L), Seq(9L, 9L, 9L))
    assert(r.isNullAt(r.fieldIndex("t_yuen")))
  }
}
