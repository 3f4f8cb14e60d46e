package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Jonckheere

/** Jonckheere–Terpstra ordered trend (q175): hand-computed J and
  * tie-corrected variance, antisymmetry, the degenerate guard, and
  * the dominance property vs an unordered test. Value-level oracle
  * equivalence runs through graft.Verify. */
class JonckheereSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def jt(rows: Seq[(Long, Long)], grid: Long = 1L) = {
    import spark.implicits._
    Jonckheere.jonckheere(rows.toDF("w", "v").repartition(3), grid)
      .collect().head
  }

  test("no-ties hand case {1,2|3,4|5,6}: J = 12, z = 12/√25.3333 = 2.3842") {
    // mean2 = 12, J2 = 24, 4Var = 456/18 = 25.3333
    val r = jt(Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 5L), (3L, 6L)))
    assert(r.getLong(r.fieldIndex("n_total")) == 6L)
    assert(r.getLong(r.fieldIndex("k_levels")) == 3L)
    assert(r.getLong(r.fieldIndex("j2_stat")) == 24L)
    assert(r.getDouble(r.fieldIndex("z_jt")) == 2.3842)
    assert(math.abs(r.getDouble(r.fieldIndex("p_value")) - 0.0171) < 5e-4)
  }

  test("tie-corrected hand case {1,1|1,2}: J = 3, Var = 1, z = 1") {
    // J2 = 6, mean2 = 4, t2num = 2; 4Var = 54/18 + 0 + 24/24 = 4
    val r = jt(Seq((1L, 1L), (1L, 1L), (2L, 1L), (2L, 2L)))
    assert(r.getLong(r.fieldIndex("j2_stat")) == 6L)
    assert(r.getDouble(r.fieldIndex("z_jt")) == 1.0)
  }

  test("reversed level order negates z") {
    val fwd = jt(Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 5L), (3L, 6L)))
    val rev = jt(Seq((3L, 1L), (3L, 2L), (2L, 3L), (2L, 4L), (1L, 5L), (1L, 6L)))
    assert(rev.getDouble(rev.fieldIndex("z_jt")) ==
      -fwd.getDouble(fwd.fieldIndex("z_jt")))
  }

  test("all values tied: the variance self-cancels to 0 → NULL z") {
    val r = jt(Seq((1L, 7L), (1L, 7L), (2L, 7L), (2L, 7L)))
    assert(r.isNullAt(r.fieldIndex("z_jt")))
    assert(r.isNullAt(r.fieldIndex("p_value")))
  }

  test("grid quantization: midcounted ties keep the statistic sane") {
    // values 101..106 on a grid of 100 collapse to cells 1..1 — all
    // tied → NULL; on grid 1 they order perfectly
    val rows = Seq((1L, 101L), (1L, 102L), (2L, 103L), (2L, 104L),
      (3L, 105L), (3L, 106L))
    val coarse = jt(rows, grid = 1000L)
    assert(coarse.isNullAt(coarse.fieldIndex("z_jt")))
    val fine = jt(rows)
    assert(fine.getDouble(fine.fieldIndex("z_jt")) == 2.3842)
  }

  test("monotone alternative: |z_jt| exceeds the planted-noise level") {
    // 4 levels, 5 values each, strictly increasing blocks
    val rows = for (w <- 1L to 4L; i <- 1L to 5L) yield (w, w * 100L + i)
    val r = jt(rows)
    assert(r.getDouble(r.fieldIndex("z_jt")) > 4.0)
    assert(r.getDouble(r.fieldIndex("p_value")) < 1e-4)
  }

  test("registered q175 at sf0.001: 5 levels, sane z/p") {
    val r = Jonckheere.priorityValueTrend(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(r.getLong(r.fieldIndex("k_levels")) == 5L)
    if (!r.isNullAt(r.fieldIndex("p_value"))) {
      val p = r.getDouble(r.fieldIndex("p_value"))
      assert(p >= 0.0 && p <= 1.0)
    }
  }
}
