package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.LjungBox

/** Ljung–Box whiteness test (q173): hand-computed lag sum, the
  * white-noise direction, NULL-lag exclusion, and the registered
  * frame. Value-level oracle equivalence runs through graft.Verify. */
class LjungBoxSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def lb(rows: Seq[(Int, Long, Long, Option[Double])]) = {
    import spark.implicits._
    LjungBox.ljungBox(rows.toDF("lag", "n_buckets", "n_pairs", "acf")
      .repartition(2)).collect().head
  }

  test("hand case: n = 100, ρ₁ = 0.5, ρ₂ = 0 → LB = 25.7576, p tiny") {
    // term₁ = (500000²·10³) div 99; LB = 100·102·term₁/10¹⁵ = 25.7576
    val r = lb(Seq((1, 100L, 99L, Some(0.5)), (2, 100L, 98L, Some(0.0))))
    assert(r.getLong(r.fieldIndex("n_buckets")) == 100L)
    assert(r.getLong(r.fieldIndex("h_lags")) == 2L)
    assert(r.getDouble(r.fieldIndex("lb_stat")) == 25.7576)
    assert(r.getDouble(r.fieldIndex("p_value")) < 0.001)
  }

  test("white noise: LB = 0, p ≈ 1 (W–H approximation floor ~0.996)") {
    val r = lb(Seq((1, 100L, 99L, Some(0.0)), (2, 100L, 98L, Some(0.0))))
    assert(r.getDouble(r.fieldIndex("lb_stat")) == 0.0)
    assert(r.getDouble(r.fieldIndex("p_value")) > 0.99)
  }

  test("NULL-acf lags are excluded from h") {
    val r = lb(Seq((1, 100L, 99L, Some(0.5)), (2, 100L, 98L, None),
      (3, 100L, 97L, Some(0.0))))
    assert(r.getLong(r.fieldIndex("h_lags")) == 2L)
  }

  test("stronger autocorrelation → larger LB, smaller p") {
    val weak = lb(Seq((1, 200L, 199L, Some(0.1))))
    val strong = lb(Seq((1, 200L, 199L, Some(0.4))))
    assert(strong.getDouble(strong.fieldIndex("lb_stat")) >
      weak.getDouble(weak.fieldIndex("lb_stat")))
    assert(strong.getDouble(strong.fieldIndex("p_value")) <
      weak.getDouble(weak.fieldIndex("p_value")))
  }

  test("registered q173 at sf0.001: 7 lags, sane stat and p") {
    val r = LjungBox.dailyRevenueLjungBox(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(r.getLong(r.fieldIndex("h_lags")) == 7L)
    assert(r.getDouble(r.fieldIndex("lb_stat")) >= 0.0)
    val p = r.getDouble(r.fieldIndex("p_value"))
    assert(p >= 0.0 && p <= 1.0)
  }
}
