package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.RateRatio

/** Two-period rate test (q198): hand-computed conditional binomial z
  * and Wald CI, exposure-weighted nulls, and zero-count guards.
  * Value-level oracle equivalence runs through graft.Verify. */
class RateRatioSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def rt(rows: Seq[(String, Long, Long, Long)]) = {
    import spark.implicits._
    RateRatio.rateTest(rows.toDF("g", "period", "e", "x").repartition(3))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("hand case: 30 vs 10 events on equal exposure → z = √10, RR = 3") {
    val r = rt(Seq(("A", 1L, 10L, 30L), ("A", 2L, 10L, 10L)))("A")
    assert(r.getDouble(r.fieldIndex("rate_ratio")) == 3.0)
    assert(r.getDouble(r.fieldIndex("z")) == 3.1623)
    val lo = math.exp(math.log(3.0) - 1.96 * math.sqrt(1.0 / 30 + 1.0 / 10))
    val hi = math.exp(math.log(3.0) + 1.96 * math.sqrt(1.0 / 30 + 1.0 / 10))
    assert(math.abs(r.getDouble(r.fieldIndex("rr_lo")) - lo) < 2e-5)
    assert(math.abs(r.getDouble(r.fieldIndex("rr_hi")) - hi) < 2e-5)
    assert(r.getDouble(r.fieldIndex("p_value")) < 0.01)
  }

  test("equal rates on unequal exposures: z = 0, RR = 1") {
    val r = rt(Seq(("A", 1L, 30L, 30L), ("A", 2L, 10L, 10L)))("A")
    assert(r.getDouble(r.fieldIndex("z")) == 0.0)
    assert(r.getDouble(r.fieldIndex("rate_ratio")) == 1.0)
  }

  test("an empty second period NULLs the ratio chain, not the test") {
    val r = rt(Seq(("A", 1L, 10L, 20L), ("A", 2L, 10L, 0L)))("A")
    assert(r.isNullAt(r.fieldIndex("rate_ratio")))
    assert(r.isNullAt(r.fieldIndex("rr_lo")))
    assert(!r.isNullAt(r.fieldIndex("z"))) // conditional z still defined
  }

  test("groups are independent") {
    val m = rt(Seq(("A", 1L, 10L, 30L), ("A", 2L, 10L, 10L),
      ("B", 1L, 5L, 5L), ("B", 2L, 5L, 5L)))
    assert(m("A").getDouble(m("A").fieldIndex("z")) == 3.1623)
    assert(m("B").getDouble(m("B").fieldIndex("z")) == 0.0)
  }
}
