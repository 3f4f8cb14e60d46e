package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.StratAte

/** Stratified ATE (q184): the Simpson's-paradox hand case (naive vs
  * adjusted), stratified SE from exact terms, eligibility counting,
  * and the no-usable-strata empty result. Value-level oracle
  * equivalence runs through graft.Verify. */
class StratAteSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def ate(rows: Seq[(String, Int, Long)]) = {
    import spark.implicits._
    StratAte.stratifiedAte(rows.toDF("strat", "t", "y").repartition(3), 1.0)
      .collect()
  }

  // within each stratum the effect is +2000; treatment is heavily
  // confounded with the (high-outcome) stratum S2
  private val confounded = Seq(
    ("S1", 1, 10000L), ("S1", 1, 12000L),
    ("S1", 0, 8000L), ("S1", 0, 10000L), ("S1", 0, 8000L), ("S1", 0, 10000L),
    ("S2", 1, 100000L), ("S2", 1, 102000L), ("S2", 1, 100000L),
    ("S2", 1, 102000L),
    ("S2", 0, 98000L), ("S2", 0, 100000L))

  test("Simpson hand case: naive = 32000 collapses to ATE = 2000") {
    val r = ate(confounded).head
    assert(r.getLong(r.fieldIndex("n_strata")) == 2L)
    assert(r.getLong(r.fieldIndex("n_strata_used")) == 2L)
    assert(r.getLong(r.fieldIndex("n_rows_used")) == 12L)
    assert(r.getDouble(r.fieldIndex("naive_diff")) == 32000.0)
    assert(r.getDouble(r.fieldIndex("ate")) == 2000.0)
    // terms: 0.25·(1e6 + 4e6/12) each → √666666 ≈ 816.50
    assert(math.abs(r.getDouble(r.fieldIndex("se")) - 816.496) < 0.01)
    assert(math.abs(r.getDouble(r.fieldIndex("z")) - 2.4495) < 1e-3)
  }

  test("a stratum without 2 observations per arm is dropped AND counted") {
    val withThin = confounded ++ Seq(
      ("S3", 1, 999999L), ("S3", 0, 1L), ("S3", 0, 2L))
    val r = ate(withThin).head
    assert(r.getLong(r.fieldIndex("n_strata")) == 3L)
    assert(r.getLong(r.fieldIndex("n_strata_used")) == 2L)
    assert(r.getLong(r.fieldIndex("n_rows")) == 15L)
    assert(r.getLong(r.fieldIndex("n_rows_used")) == 12L)
    assert(r.getDouble(r.fieldIndex("ate")) == 2000.0) // S3 never leaks in
  }

  test("zero effect: ATE = 0 even with confounded assignment") {
    val rows = Seq(
      ("S1", 1, 10L), ("S1", 1, 20L), ("S1", 0, 10L), ("S1", 0, 20L),
      ("S2", 1, 1000L), ("S2", 1, 2000L), ("S2", 0, 1000L), ("S2", 0, 2000L),
      ("S2", 1, 1000L), ("S2", 1, 2000L))
    val r = ate(rows).head
    assert(r.getDouble(r.fieldIndex("ate")) == 0.0)
  }

  test("no usable strata: empty result, not a fabricated zero") {
    assert(ate(Seq(("S1", 1, 5L), ("S1", 0, 5L))).isEmpty)
  }
}
