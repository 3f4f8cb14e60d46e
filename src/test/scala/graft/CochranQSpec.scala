package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.CochranQ

/** Cochran's Q blocked binary test (q179): hand-computed sufficient
  * statistics, the McNemar k = 2 reduction, invariance to
  * uninformative (all-k) blocks, and presence-row dedup. Value-level
  * oracle equivalence runs through graft.Verify. */
class CochranQSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def q(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    CochranQ.cochranQ(rows.toDF("b", "w").repartition(3)).collect().head
  }

  // 4 blocks × 3 treatments: C = (4,2,1), R = (1,2,1,3)
  private val hand = Seq(
    (1L, 1L), (2L, 1L), (2L, 2L), (3L, 1L), (4L, 1L), (4L, 2L), (4L, 3L))

  test("hand case: Q = 2·(3·21 − 49)/(21 − 15) = 4.6667") {
    val r = q(hand)
    assert(r.getLong(r.fieldIndex("n_blocks")) == 4L)
    assert(r.getLong(r.fieldIndex("k_levels")) == 3L)
    assert(r.getLong(r.fieldIndex("n_ones")) == 7L)
    assert(r.getLong(r.fieldIndex("n_informative")) == 3L)
    assert(r.getDouble(r.fieldIndex("q_stat")) == 4.6667)
    val p = r.getDouble(r.fieldIndex("p_value"))
    assert(p > 0.05 && p < 0.15, s"p=$p") // exact χ²₂ tail: 0.0970
  }

  test("an all-k block is uninformative: Q unchanged, counted in n_blocks") {
    val withFull = q(hand ++ Seq((5L, 1L), (5L, 2L), (5L, 3L)))
    assert(withFull.getLong(withFull.fieldIndex("n_blocks")) == 5L)
    assert(withFull.getLong(withFull.fieldIndex("n_informative")) == 3L)
    assert(withFull.getDouble(withFull.fieldIndex("q_stat")) == 4.6667)
  }

  test("k = 2 reduces to McNemar χ² without continuity correction") {
    // 6 blocks T1-only, 2 blocks T2-only, 2 blocks both:
    // McNemar on discordants: (6−2)²/(6+2) = 2
    val rows = (1L to 6L).map((_, 1L)) ++ Seq((7L, 2L), (8L, 2L)) ++
      Seq((9L, 1L), (9L, 2L), (10L, 1L), (10L, 2L))
    assert(q(rows).getDouble(4) == 2.0) // q_stat
  }

  test("duplicate presence rows collapse to one cell") {
    assert(q(hand ++ hand).getDouble(4) ==
      q(hand).getDouble(4))
  }

  test("every block complete: denominator 0 → NULL") {
    val rows = for (b <- 1L to 3L; w <- 1L to 3L) yield (b, w)
    val r = q(rows)
    assert(r.isNullAt(r.fieldIndex("q_stat")))
    assert(r.isNullAt(r.fieldIndex("p_value")))
  }
}
