package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.LiftGains

/** Cumulative gains / lift table (q185): the perfect-scorer hand case,
  * the whole-block tie convention, uniform-score collapse, and the
  * empty-positive-class NULL. Value-level oracle equivalence runs
  * through graft.Verify. */
class LiftGainsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def lift(rows: Seq[(Long, Int)], buckets: Int = 10) = {
    import spark.implicits._
    LiftGains.liftTable(rows.toDF("s", "y").repartition(3), "s", "y", buckets)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("perfect scorer: top-2-decile capture walks 50% → 100%, lift 5×") {
    // 20 distinct scores, the top 4 positive
    val rows = (1L to 20L).map(s => (s, if (s >= 17L) 1 else 0))
    val m = lift(rows)
    val d1 = m(1L)
    assert(d1.getLong(d1.fieldIndex("n_rows")) == 2L)
    assert(d1.getLong(d1.fieldIndex("n_pos")) == 2L)
    assert(d1.getLong(d1.fieldIndex("capture_micro")) == 500000L)
    assert(d1.getLong(d1.fieldIndex("lift_micro")) == 5000000L)
    val d2 = m(2L)
    assert(d2.getLong(d2.fieldIndex("capture_micro")) == 1000000L)
    val d10 = m(10L)
    assert(d10.getLong(d10.fieldIndex("capture_micro")) == 1000000L)
    assert(d10.getLong(d10.fieldIndex("n_pos")) == 0L)
    assert(d10.getLong(d10.fieldIndex("lift_micro")) == 0L)
  }

  test("a tie block lands WHOLE in its first row's decile") {
    // scores A(2 rows) > B(6 rows) > C(2 rows), 5 buckets over N=10:
    // B starts at cum 2 → decile 2; C starts at cum 8 → decile 5
    val rows = Seq.fill(2)((30L, 1)) ++ Seq.fill(6)((20L, 0)) ++
      Seq.fill(2)((10L, 0))
    val m = lift(rows, buckets = 5)
    assert(m.keySet == Set(1L, 2L, 5L)) // deciles 3, 4 empty — no split
    assert(m(2L).getLong(m(2L).fieldIndex("n_rows")) == 6L)
  }

  test("uniform scores: one block, capture 100%, lift exactly 1×") {
    val m = lift(Seq((5L, 1), (5L, 0), (5L, 1), (5L, 0)))
    assert(m.keySet == Set(1L))
    assert(m(1L).getLong(m(1L).fieldIndex("capture_micro")) == 1000000L)
    assert(m(1L).getLong(m(1L).fieldIndex("lift_micro")) == 1000000L)
  }

  test("no positives: capture/lift NULL, counts intact") {
    val m = lift((1L to 10L).map((_, 0)))
    val d1 = m(1L)
    assert(d1.isNullAt(d1.fieldIndex("capture_micro")))
    assert(d1.isNullAt(d1.fieldIndex("lift_micro")))
    assert(d1.getLong(d1.fieldIndex("n_rows")) == 1L)
  }
}
