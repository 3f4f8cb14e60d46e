package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Friedman

/** Friedman blocked rank test (q177): perfectly consistent and
  * perfectly rotated rankings, the all-tied NULL, incomplete-block
  * exclusion, and the registered frame. Value-level oracle
  * equivalence runs through graft.Verify. */
class FriedmanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fr(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    Friedman.friedman(rows.toDF("b", "w", "v").repartition(3))
      .collect().head
  }

  /** b blocks where treatment j always lands value base+j. */
  private def consistent(b: Int, k: Int): Seq[(Long, Long, Long)] =
    for (bi <- 1 to b; j <- 1 to k)
      yield (bi.toLong, j.toLong, bi * 1000L + j * 10L)

  test("perfectly consistent rankings over 3 blocks of 3: χ² = 6, p ≈ 0.05") {
    val r = fr(consistent(3, 3))
    assert(r.getLong(r.fieldIndex("n_blocks")) == 3L)
    assert(r.getLong(r.fieldIndex("k_levels")) == 3L)
    assert(r.getLong(r.fieldIndex("b_dropped")) == 0L)
    assert(r.getDouble(r.fieldIndex("chi2_f")) == 6.0)
    val p = r.getDouble(r.fieldIndex("p_value"))
    assert(p > 0.03 && p < 0.07, s"p=$p") // exact e^{-3} = 0.0498 (W–H approx)
  }

  test("perfectly rotated rankings: χ² = 0 exactly") {
    // each treatment takes each rank once across 3 blocks
    val rows = Seq(
      (1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L),
      (2L, 1L, 20L), (2L, 2L, 30L), (2L, 3L, 10L),
      (3L, 1L, 30L), (3L, 2L, 10L), (3L, 3L, 20L))
    val r = fr(rows)
    assert(r.getDouble(r.fieldIndex("chi2_f")) == 0.0)
    assert(r.getDouble(r.fieldIndex("p_value")) > 0.95)
  }

  test("all blocks fully tied: correction hits 0 → NULL") {
    val rows = for (b <- 1L to 3L; j <- 1L to 3L) yield (b, j, 7L)
    val r = fr(rows)
    assert(r.isNullAt(r.fieldIndex("chi2_f")))
    assert(r.isNullAt(r.fieldIndex("p_value")))
  }

  test("incomplete blocks are dropped and counted, not mixed in") {
    val full = fr(consistent(3, 3))
    val withPartial = fr(consistent(3, 3) :+ (9L, 1L, 999L)) // block 9 has 1 of 3
    assert(withPartial.getLong(withPartial.fieldIndex("b_dropped")) == 1L)
    assert(withPartial.getLong(withPartial.fieldIndex("n_blocks")) == 3L)
    assert(withPartial.getDouble(withPartial.fieldIndex("chi2_f")) ==
      full.getDouble(full.fieldIndex("chi2_f")))
  }

  test("within-block ties midrank: two tied treatments share the rank") {
    // block 1: t1=t2 < t3; block 2: clean 1<2<3 — χ² must be finite
    val rows = Seq(
      (1L, 1L, 10L), (1L, 2L, 10L), (1L, 3L, 30L),
      (2L, 1L, 10L), (2L, 2L, 20L), (2L, 3L, 30L))
    val r = fr(rows)
    assert(!r.isNullAt(r.fieldIndex("chi2_f")))
    assert(r.getDouble(r.fieldIndex("chi2_f")) > 0.0)
  }

  test("registered q177 at sf0.001: 5 priorities across the year blocks") {
    val r = Friedman.priorityYearFriedman(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(r.getLong(r.fieldIndex("k_levels")) == 5L)
    assert(r.getLong(r.fieldIndex("n_blocks")) > 0L)
    if (!r.isNullAt(r.fieldIndex("p_value"))) {
      val p = r.getDouble(r.fieldIndex("p_value"))
      assert(p >= 0.0 && p <= 1.0)
    }
  }
}
