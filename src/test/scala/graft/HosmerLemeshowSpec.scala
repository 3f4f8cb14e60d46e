package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.HosmerLemeshow

/** Hosmer–Lemeshow (q223): exact cell terms on micro-unit forecasts,
  * the perfectly calibrated zero, degenerate-group accounting,
  * too-few-groups NULL. Value-level oracle equivalence runs through
  * graft.Verify. */
class HosmerLemeshowSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def hl(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    HosmerLemeshow.hosmerLemeshow(
      rows.toDF("n_ev", "x_ev", "p_micro").repartition(4))
      .collect().head
  }

  test("a perfectly calibrated forecast reads HL = 0 with p near 1") {
    val r = hl(Seq((10L, 5L, 500000L), (20L, 10L, 500000L),
      (10L, 2L, 200000L)))
    assert(r.getDouble(r.fieldIndex("hl")) == 0.0)
    // held-out form: df = G (external validation), not in-sample G-2
    assert(r.getLong(r.fieldIndex("df")) == 3L)
    assert(r.getDouble(r.fieldIndex("p_value")) > 0.9)
  }

  test("one off group contributes its exact term: (8−5)²/(5·0.5) = 3.6") {
    val r = hl(Seq((10L, 5L, 500000L), (10L, 5L, 500000L),
      (10L, 8L, 500000L)))
    assert(r.getDouble(r.fieldIndex("hl")) == 3.6)
    assert(r.getLong(r.fieldIndex("df")) == 3L)
    // χ²₃ tail at 3.6 ≈ 0.308 — the W–H + A&S chain must land near it
    val p = r.getDouble(r.fieldIndex("p_value"))
    assert(p > 0.25 && p < 0.37)
  }

  test("degenerate groups (p = 0 or 1) are excluded and counted") {
    val r = hl(Seq((10L, 5L, 500000L), (10L, 5L, 500000L),
      (10L, 8L, 500000L), (10L, 10L, 1000000L), (10L, 0L, 0L)))
    assert(r.getLong(r.fieldIndex("n_groups")) == 3L)
    assert(r.getLong(r.fieldIndex("n_degenerate")) == 2L)
    assert(r.getDouble(r.fieldIndex("hl")) == 3.6)
  }

  test("fewer than 3 informative groups: NULL (uninformative)") {
    val r = hl(Seq((10L, 5L, 500000L), (10L, 8L, 500000L)))
    assert(r.isNullAt(r.fieldIndex("hl")))
    assert(r.isNullAt(r.fieldIndex("p_value")))
  }
}
