package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.ForecastCoverage

/** Forecast coverage (q310): registered-shape invariants — coverage
  * bounds, sigma positivity on real data, and accounting consistency
  * with the q289 split. Value-level oracle equivalence runs through
  * graft.Verify. */
class ForecastCoverageSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  lazy val rows = ForecastCoverage.dailyRevenueCoverage(
    spark, "/root/testdata/sf0.001").collect()

  test("shape: one row per priority with the audit columns") {
    val cols = ForecastCoverage.dailyRevenueCoverage(
      spark, "/root/testdata/sf0.001").columns.toSeq
    assert(cols == Seq("o_orderpriority", "n_train_err", "sigma",
      "n_test", "n_covered", "coverage_ppm"))
    assert(rows.length == 5)
  }

  test("coverage is a proper fraction and counts are consistent") {
    rows.foreach { r =>
      val (nt, nc) = (r.getLong(r.fieldIndex("n_test")),
        r.getLong(r.fieldIndex("n_covered")))
      assert(nc >= 0L && nc <= nt)
      val ppm = r.getLong(r.fieldIndex("coverage_ppm"))
      assert(ppm == nc * 1000000 / nt)
    }
  }

  test("sigma is positive and the nominal band covers a majority") {
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("sigma")) > 0.0)
      // on near-iid daily sums the 1.96σ SES band should cover well
      // over half the holdout — if this fails the interval is junk
      assert(r.getLong(r.fieldIndex("coverage_ppm")) > 500000L)
    }
  }

  test("split accounting matches q289's lag-bank contract") {
    // n_train_err + n_test = days with a full 20-lag bank
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_train_err")) > 0L)
      assert(r.getLong(r.fieldIndex("n_test")) > 0L &&
        r.getLong(r.fieldIndex("n_test")) <= 28L)
    }
  }
}
