package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Atkinson

/** Atkinson ε=1 (q212): exact two-point geometric-mean hand case,
  * equality → 0, exclusion accounting, group isolation. Value-level
  * oracle equivalence runs through graft.Verify. */
class AtkinsonSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def atk(rows: Seq[(Int, Long)]) = {
    import spark.implicits._
    Atkinson.atkinson(rows.toDF("g", "x").repartition(4))
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  test("perfect equality reads A = 0 exactly") {
    val r = atk(Seq((1, 100L), (1, 100L), (1, 100L)))(1)
    assert(r.getDouble(r.fieldIndex("atkinson")) == 0.0)
    assert(r.getDouble(r.fieldIndex("ede_x")) == 100.0)
  }

  test("two-point hand case: geo 200 vs mean 250 gives A = 0.2") {
    // x = (100, 400): geomean = √40000 = 200, mean = 250,
    // A = 1 − 200/250 = 0.2 exactly (on the 1e-9 ln/exp snaps the
    // round-6 report cannot move)
    val r = atk(Seq((1, 100L), (1, 400L)))(1)
    assert(r.getDouble(r.fieldIndex("atkinson")) == 0.2)
    assert(r.getDouble(r.fieldIndex("mean_x")) == 250.0)
    assert(r.getDouble(r.fieldIndex("ede_x")) == 200.0)
  }

  test("non-positive entities are excluded and counted") {
    val r = atk(Seq((1, 100L), (1, 400L), (1, 0L), (1, -7L)))(1)
    assert(r.getLong(r.fieldIndex("n_pos")) == 2L)
    assert(r.getLong(r.fieldIndex("n_excluded")) == 2L)
    assert(r.getDouble(r.fieldIndex("atkinson")) == 0.2)
  }

  test("all-excluded group reports NULL index") {
    val r = atk(Seq((1, 0L), (1, -1L)))(1)
    assert(r.isNullAt(r.fieldIndex("atkinson")))
    assert(r.isNullAt(r.fieldIndex("mean_x")))
  }

  test("groups are independent") {
    val m = atk(Seq((1, 100L), (1, 400L), (2, 50L), (2, 50L)))
    assert(m(1).getDouble(m(1).fieldIndex("atkinson")) == 0.2)
    assert(m(2).getDouble(m(2).fieldIndex("atkinson")) == 0.0)
  }

  test("more spread at the poor tail raises A above the Gini-blind read") {
    // (1, 100, 100) vs (67, 67, 67·4): same mean region, but the
    // near-zero entity collapses the geomean — A must be large
    val r = atk(Seq((1, 1L), (1, 100L), (1, 100L)))(1)
    assert(r.getDouble(r.fieldIndex("atkinson")) > 0.65)
  }
}
