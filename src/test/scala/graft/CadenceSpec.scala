package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Cadence

/** Cadence invariants. Value-level oracle equivalence runs through
  * graft.Verify. */
class CadenceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def run(ev: Seq[(String, Long)]): Map[String, org.apache.spark.sql.Row] = {
    import spark.implicits._
    Cadence.cadence(ev.toDF("k", "d"), "k", "d").collect()
      .map(r => r.getString(0) -> r).toMap
  }

  test("hand case: gaps, lower median, overdue vs personal rhythm") {
    // dataset max day = 100 (set by customer c)
    val got = run(Seq(
      // a: days 0,10,20,30 -> gaps 10,10,10; median 10; last 30;
      // since-last 70 > 2*10 -> overdue
      "a" -> 0L, "a" -> 10L, "a" -> 20L, "a" -> 30L,
      // b: days 90,95,100? no - b: 60, 90, 96 -> gaps 30,6; lower
      // median 6; since-last 4 <= 12 -> active
      "b" -> 60L, "b" -> 90L, "b" -> 96L,
      // c: single order at 100 -> new
      "c" -> 100L))
    val a = got("a")
    assert(a.getLong(1) == 4 && a.getLong(2) == 3)
    assert(a.getDouble(3) == 10.0 && a.getLong(4) == 10 && a.getLong(5) == 10)
    assert(a.getLong(6) == 70 && a.getString(7) == "overdue")
    val b = got("b")
    assert(b.getLong(4) == 6, "even gap count takes the LOWER median")
    assert(b.getLong(5) == 30 && b.getLong(6) == 4 && b.getString(7) == "active")
    val c = got("c")
    assert(c.getLong(2) == 0 && c.isNullAt(4) && c.getString(7) == "new")
  }

  test("same-day repeat orders contribute gap 0 deterministically") {
    val got = run(Seq("x" -> 5L, "x" -> 5L, "x" -> 9L))
    val x = got("x")
    assert(x.getLong(2) == 2)
    assert(x.getLong(4) == 0, "lower median of {0,4} is 0")
    assert(x.getLong(5) == 4)
  }

  test("q118 over testdata: statuses partition; median <= max; gaps consistent") {
    val rows = Cadence.customerCadence(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) - 1)
      assert(Set("new", "overdue", "active")(r.getString(7)))
      if (!r.isNullAt(4)) assert(r.getLong(4) <= r.getLong(5))
      if (r.getString(7) == "new") assert(r.getLong(2) == 0)
    }
    assert(rows.exists(_.getString(7) != "new"), "multi-order customers exist")
  }
}
