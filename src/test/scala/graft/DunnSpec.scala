package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Dunn

/** Dunn's post-hoc pairs (q206): hand-computed two-group z, the
  * pooled-variance tie NULL, the pair-family Bonferroni multiplier,
  * and pooled-rank (not per-pair) semantics. Value-level oracle
  * equivalence runs through graft.Verify. */
class DunnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def dunn(vals: Seq[(Long, Long)]) = {
    import spark.implicits._
    Dunn.dunnTest(vals.toDF("w", "v").repartition(5))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
  }

  test("two separated groups: z = -1.5492 on the round-4 grid") {
    // X={1,2}, Y={3,4}: mean ranks 1.5 vs 3.5, sigma^2 = 5/3 →
    // z = -2/sqrt(5/3); k = 2 → Bonferroni multiplier 1
    val r = dunn(Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L)))((1L, 2L))
    assert(r.getDouble(r.fieldIndex("z_dunn")) == -1.5492)
    assert(r.getDouble(r.fieldIndex("p_value")) ==
      r.getDouble(r.fieldIndex("p_bonf")))
    val p = r.getDouble(r.fieldIndex("p_value"))
    assert(p > 0.11 && p < 0.13)
  }

  test("all values tied: the corrected variance is 0 and z is NULL") {
    val r = dunn(Seq((1L, 5L), (1L, 5L), (2L, 5L), (2L, 5L)))((1L, 2L))
    assert(r.isNullAt(r.fieldIndex("z_dunn")))
  }

  test("three levels emit three pairs with the 3x Bonferroni family") {
    val m = dunn(Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L),
      (3L, 5L), (3L, 6L)))
    assert(m.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val r = m((1L, 3L))
    val expect = math.min(1.0, r.getDouble(r.fieldIndex("p_value")) * 3.0)
    assert(math.abs(r.getDouble(r.fieldIndex("p_bonf")) - expect) < 1e-6)
  }

  test("pooled ranks: a third group SHIFTS a pair's z (not per-pair MW)") {
    // Dunn reads pair (1,2) against the POOLED midranks and pooled
    // variance, so adding a third group changes the (1,2) z — the
    // semantic difference from pairwise Mann-Whitney, pinned
    val two = dunn(Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L)))((1L, 2L))
    val three = dunn(Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L),
      (3L, 10L), (3L, 11L)))((1L, 2L))
    assert(two.getDouble(two.fieldIndex("z_dunn")) !=
      three.getDouble(three.fieldIndex("z_dunn")))
  }
}
