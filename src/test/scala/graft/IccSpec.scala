package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Icc

/** ICC(1) (q203): perfect-reliability and zero-between hand cases
  * (both exact), a worked mixed case, degenerate drops, and group
  * independence. Value-level oracle equivalence runs through
  * graft.Verify. */
class IccSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fit(vals: Seq[(String, String, Long)]) = {
    import spark.implicits._
    Icc.icc1(vals.toDF("g", "cl", "x").repartition(5))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("perfect reliability: zero within-variance gives ICC = 1 exactly") {
    val r = fit(Seq(("a", "c1", 5L), ("a", "c1", 5L),
      ("a", "c2", 9L), ("a", "c2", 9L), ("a", "c3", 2L), ("a", "c3", 2L)))("a")
    assert(r.getDouble(r.fieldIndex("msw")) == 0.0)
    assert(r.getDouble(r.fieldIndex("icc1")) == 1.0)
  }

  test("zero between-variance: balanced identical clusters give -1/(k0-1)") {
    // 3 clusters of {1,3}: SSB = 0, MSW = 2, k0 = 2 → ICC = -1 exactly
    val r = fit(Seq(("a", "c1", 1L), ("a", "c1", 3L),
      ("a", "c2", 1L), ("a", "c2", 3L), ("a", "c3", 1L), ("a", "c3", 3L)))("a")
    assert(r.getDouble(r.fieldIndex("msb")) == 0.0)
    assert(r.getDouble(r.fieldIndex("k0")) == 2.0)
    assert(r.getDouble(r.fieldIndex("icc1")) == -1.0)
  }

  test("worked mixed case: clusters {1,2} and {3,4}") {
    // SSB = 29 - 25 = 4 → MSB = 4; SSW = 30 - 29 = 1 → MSW = 0.5;
    // k0 = 2 → ICC = 3.5/4.5 = 0.777778
    val r = fit(Seq(("a", "c1", 1L), ("a", "c1", 2L),
      ("a", "c2", 3L), ("a", "c2", 4L)))("a")
    assert(r.getDouble(r.fieldIndex("msb")) == 4.0)
    assert(r.getDouble(r.fieldIndex("msw")) == 0.5)
    assert(r.getDouble(r.fieldIndex("icc1")) == 0.777778)
  }

  test("degenerate groups are dropped: one cluster; no replication") {
    val m = fit(Seq(
      ("one", "c1", 1L), ("one", "c1", 2L),
      ("norep", "c1", 1L), ("norep", "c2", 2L),
      ("ok", "c1", 1L), ("ok", "c1", 2L), ("ok", "c2", 3L)))
    assert(!m.contains("one") && !m.contains("norep") && m.contains("ok"))
  }

  test("group independence") {
    val a = Seq(("a", "c1", 1L), ("a", "c1", 2L), ("a", "c2", 3L), ("a", "c2", 4L))
    val b = (1 to 100).map(i => ("b", s"c${i % 10}", (i * 7 % 23).toLong))
    val solo = fit(a)("a").getDouble(6)
    val both = fit(a ++ b)("a").getDouble(6)
    assert(solo == both)
  }
}
