package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Cmh

/** Cochran–Mantel–Haenszel (q192): hand-computed hypergeometric
  * moments, pooled-evidence doubling, degenerate-stratum exclusion,
  * and the null table. Value-level oracle equivalence runs through
  * graft.Verify. */
class CmhSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def cmh(rows: Seq[(String, Int, Int)]) = {
    import spark.implicits._
    Cmh.cmh(rows.toDF("strat", "t", "y").repartition(3)).collect().head
  }

  /** One 2×2 stratum (a, b, c, d) as unit rows. */
  private def table(s: String, a: Int, b: Int, c: Int, d: Int) =
    Seq.fill(a)((s, 1, 1)) ++ Seq.fill(b)((s, 1, 0)) ++
      Seq.fill(c)((s, 0, 1)) ++ Seq.fill(d)((s, 0, 0))

  test("hand case (6,2,2,6): E = 4, V = 16/15, χ² = 3.75, OR = 9") {
    val r = cmh(table("S1", 6, 2, 2, 6))
    assert(r.getLong(r.fieldIndex("a_sum")) == 6L)
    assert(r.getDouble(r.fieldIndex("chi2_cmh")) == 3.75)
    assert(r.getDouble(r.fieldIndex("or_mh")) == 9.0)
    val p = r.getDouble(r.fieldIndex("p_value"))
    assert(p > 0.04 && p < 0.06, s"p=$p") // χ²₁ tail at 3.75 ≈ 0.0528
  }

  test("two identical strata double the evidence, keep OR_MH") {
    val r = cmh(table("S1", 6, 2, 2, 6) ++ table("S2", 6, 2, 2, 6))
    assert(r.getDouble(r.fieldIndex("or_mh")) == 9.0)
    assert(r.getDouble(r.fieldIndex("chi2_cmh")) == 7.5) // (2Δ)²/(2V)
    assert(r.getLong(r.fieldIndex("n_strata_used")) == 2L)
  }

  test("a stratum with an empty margin contributes zero, is counted") {
    val base = cmh(table("S1", 6, 2, 2, 6))
    val withDegenerate = cmh(table("S1", 6, 2, 2, 6) ++
      table("S3", 5, 3, 0, 0)) // m0 margin empty? c+d=0 → n0 = 0
    assert(withDegenerate.getLong(
      withDegenerate.fieldIndex("n_strata")) == 2L)
    assert(withDegenerate.getLong(
      withDegenerate.fieldIndex("n_strata_used")) == 1L)
    assert(withDegenerate.getDouble(withDegenerate.fieldIndex("chi2_cmh")) ==
      base.getDouble(base.fieldIndex("chi2_cmh")))
  }

  test("no association: χ² = 0, OR = 1") {
    val r = cmh(table("S1", 4, 4, 4, 4))
    assert(r.getDouble(r.fieldIndex("chi2_cmh")) == 0.0)
    assert(r.getDouble(r.fieldIndex("or_mh")) == 1.0)
  }
}
