package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Brier

/** Brier / Murphy decomposition (q167): exact hand-computed cells for
  * the calibrated, constant, and miscalibrated forecasters, and the
  * B = REL − RES + UNC identity on the registered frame. Value-level
  * oracle equivalence runs through graft.Verify. */
class BrierSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def dec(cells: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val r = Brier.decompose(
      cells.toDF("p_micro", "n_ev", "x_ev").repartition(3)).collect().head
    (r.getDouble(r.fieldIndex("brier")),
      r.getDouble(r.fieldIndex("reliability")),
      r.getDouble(r.fieldIndex("resolution")),
      r.getDouble(r.fieldIndex("uncertainty")))
  }

  test("perfectly calibrated sharp forecaster: REL = 0, B = UNC − RES (hand case)") {
    // cells (p=0.25, n=4, x=1), (p=0.75, n=4, x=3): ō=0.5
    // REL = 0; RES = [4(.25−.5)² + 4(.75−.5)²]/8 = 0.0625; UNC = 0.25
    // B = 0.1875 (brier_num 7.5e11 per cell — exact, verified by hand)
    val (b, rel, res, unc) = dec(Seq((250000L, 4L, 1L), (750000L, 4L, 3L)))
    assert(rel == 0.0)
    assert(res == 0.0625)
    assert(unc == 0.25)
    assert(b == 0.1875)
    assert(math.abs(b - (rel - res + unc)) < 1e-9)
  }

  test("constant base-rate forecaster: RES = 0, B = UNC (honest but useless)") {
    // one cell p = ō = 0.5
    val (b, rel, res, unc) = dec(Seq((500000L, 8L, 4L)))
    assert(rel == 0.0 && res == 0.0)
    assert(b == unc && unc == 0.25)
  }

  test("miscalibrated forecaster pays pure reliability") {
    // forecasts 0.9 where the rate is 0.5: REL = (0.4)² = 0.16
    val (b, rel, res, unc) = dec(Seq((900000L, 10L, 5L)))
    assert(math.abs(rel - 0.16) < 1e-6)
    assert(res == 0.0)
    assert(math.abs(b - (rel + unc)) < 1e-6)
  }

  test("registered q167: Murphy identity + bounds on the real frame") {
    val r = Brier.orderFinishBrier(spark, "/root/testdata/sf0.001")
      .collect().head
    val b = r.getDouble(r.fieldIndex("brier"))
    val rel = r.getDouble(r.fieldIndex("reliability"))
    val res = r.getDouble(r.fieldIndex("resolution"))
    val unc = r.getDouble(r.fieldIndex("uncertainty"))
    assert(math.abs(b - (rel - res + unc)) < 1e-4,
      s"identity broke: $b vs ${rel - res + unc}")
    assert(b > 0 && b < 0.26 && rel >= 0 && res >= 0 && unc > 0 && unc <= 0.25)
    // a correctly-specified baseline: mostly uncertainty, tiny REL
    assert(rel < 0.01)
  }
}
