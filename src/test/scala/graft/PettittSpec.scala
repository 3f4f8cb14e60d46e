package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Pettitt

/** Pettitt rank changepoint (q174): hand-computed U walk on a planted
  * shift, tie midranks, the clamp, and outlier robustness vs a mean
  * split. Value-level oracle equivalence runs through graft.Verify. */
class PettittSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def pt(xs: Seq[Long]) = {
    import spark.implicits._
    Pettitt.pettitt(xs.zipWithIndex.map { case (x, i) => (i + 1L, x) }
      .toDF("t", "x").repartition(3), "t", "x").collect().head
  }

  test("planted shift [1,2,3 | 10,11,12]: K = 9 at t = 3") {
    // U_t = 2R_t − t·7: −5, −8, −9, −8, −5 → K = 9, argmax t = 3
    val r = pt(Seq(1L, 2L, 3L, 10L, 11L, 12L))
    assert(r.getLong(r.fieldIndex("n_buckets")) == 6L)
    assert(r.getLong(r.fieldIndex("k_stat")) == 9L)
    assert(r.getLong(r.fieldIndex("change_bucket")) == 3L)
    val expP = math.floor(math.exp(-6.0 * 81.0 / (216.0 + 36.0)) * 1e9 + 0.5) / 1e9 * 2.0
    assert(math.abs(r.getDouble(r.fieldIndex("p_value")) - expP) < 1e-6)
  }

  test("tie midranks: [5,5,1] → K = 2 at t = 2, p clamped to 1") {
    val r = pt(Seq(5L, 5L, 1L))
    assert(r.getLong(r.fieldIndex("k_stat")) == 2L)
    assert(r.getLong(r.fieldIndex("change_bucket")) == 2L)
    assert(r.getDouble(r.fieldIndex("p_value")) == 1.0)
  }

  test("monotone drift: first bucket achieving the max is elected") {
    // [1..5]: |U| = 4, 6, 6, 4 → K = 6, first at t = 2
    val r = pt(Seq(1L, 2L, 3L, 4L, 5L))
    assert(r.getLong(r.fieldIndex("k_stat")) == 6L)
    assert(r.getLong(r.fieldIndex("change_bucket")) == 2L)
  }

  test("rank robustness: a wild spike shifts the breakpoint one rank, not to itself") {
    // clean low/high shift after t=5 with a spike at t=2: the spike
    // costs one rank of evidence (elects t=6, the shift boundary's
    // other side) — a mean split would be yanked toward the spike
    val base = Seq(10L, 5000L, 12L, 11L, 10L, 100L, 101L, 102L, 103L, 104L)
    val r = pt(base)
    assert(r.getLong(r.fieldIndex("change_bucket")) == 6L)
  }

  test("registered q174 at sf0.001: a day is elected, p in [0,1]") {
    val r = Pettitt.dailyRevenuePettitt(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(r.getLong(r.fieldIndex("n_buckets")) > 100L)
    assert(!r.isNullAt(r.fieldIndex("change_bucket")))
    val p = r.getDouble(r.fieldIndex("p_value"))
    assert(p >= 0.0 && p <= 1.0)
  }
}
