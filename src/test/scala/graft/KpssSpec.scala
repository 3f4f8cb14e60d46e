package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Kpss

/** KPSS (q216): exact rational η on hand series at two bandwidths,
  * the trend-vs-noise ordering, constant NULL, group isolation.
  * Value-level oracle equivalence runs through graft.Verify. */
class KpssSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def eta(rows: Seq[(Int, Long, Long)], lags: Int) = {
    import spark.implicits._
    Kpss.kpss(rows.toDF("g", "t", "x").repartition(4), lags)
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  test("alternating series at q=0: η = 0.125 exactly") {
    // e' = (4,−4,4,−4), S' = (4,0,4,0): ΣS'² = 32, γ'₀ = 64,
    // η = 1·32/(4·64)
    val r = eta(Seq((1, 0L, 1L), (1, 1L, -1L), (1, 2L, 1L), (1, 3L, -1L)), 0)(1)
    assert(r.getDouble(r.fieldIndex("eta")) == 0.125)
  }

  test("alternating series at q=1: the Bartlett kernel shrinks D to 32, η = 0.5") {
    // γ'₁ = −48, D = 2·64 + 2·(−48) = 32, η = 2·32/(4·32)
    val r = eta(Seq((1, 0L, 1L), (1, 1L, -1L), (1, 2L, 1L), (1, 3L, -1L)), 1)(1)
    assert(r.getDouble(r.fieldIndex("eta")) == 0.5)
    assert(r.getInt(r.fieldIndex("lags")) == 1)
  }

  test("ramp at q=0: η = 0.425 exactly — drift reads far above noise") {
    // e' = (−6,−2,2,6), S' = (−6,−8,−6,0): ΣS'² = 136, γ'₀ = 80
    val r = eta(Seq((1, 0L, 1L), (1, 1L, 2L), (1, 2L, 3L), (1, 3L, 4L)), 0)(1)
    assert(r.getDouble(r.fieldIndex("eta")) == 0.425)
  }

  test("constant series: zero long-run variance guards to NULL") {
    val r = eta(Seq((1, 0L, 7L), (1, 1L, 7L), (1, 2L, 7L)), 0)(1)
    assert(r.isNullAt(r.fieldIndex("eta")))
  }

  test("groups are independent") {
    val m = eta(Seq((1, 0L, 1L), (1, 1L, -1L), (1, 2L, 1L), (1, 3L, -1L),
      (2, 0L, 1L), (2, 1L, 2L), (2, 2L, 3L), (2, 3L, 4L)), 0)
    assert(m(1).getDouble(m(1).fieldIndex("eta")) == 0.125)
    assert(m(2).getDouble(m(2).fieldIndex("eta")) == 0.425)
  }
}
