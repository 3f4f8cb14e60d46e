package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.SignedRank

/** Wilcoxon signed-rank (q170): the classic no-ties hand case, a
  * tie-corrected hand case, zero-difference exclusion, and sign
  * antisymmetry. Value-level oracle equivalence runs through
  * graft.Verify. */
class SignedRankSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def wsr(ds: Seq[Long], grid: Long = 1L) = {
    import spark.implicits._
    SignedRank.wilcoxonSignedRank(ds.toDF("d").repartition(3), grid)
      .collect().head
  }

  test("classic hand case {+1,−2,+3,−4,+5}: W⁺ = 9, z = 6/√220 = 0.4045") {
    // t_num = 4·9 − 5·6 = 6; vi = 2·5·6·11 − 0 = 660; z = 6/√(660/3)
    val r = wsr(Seq(1L, -2L, 3L, -4L, 5L))
    assert(r.getLong(r.fieldIndex("n_pairs")) == 5L)
    assert(r.getLong(r.fieldIndex("n_pos")) == 3L)
    assert(r.getLong(r.fieldIndex("n_neg")) == 2L)
    assert(r.getDouble(r.fieldIndex("z_w")) == 0.4045)
  }

  test("tie correction: {+150,+150,−150} on the dollar grid") {
    // one cell (g=1, cnt=3): T = 24, vi = 2·3·4·7 − 24 = 144
    // r2 = 4, w2 = 8, t_num = 16 − 12 = 4, z = 4/√48 = 0.5774
    val r = wsr(Seq(150L, 150L, -150L), grid = 100L)
    assert(r.getDouble(r.fieldIndex("z_w")) == 0.5774)
  }

  test("zero differences are dropped on the exact value") {
    val withZeros = wsr(Seq(1L, -2L, 3L, -4L, 5L, 0L, 0L))
    assert(withZeros.getLong(withZeros.fieldIndex("n_pairs")) == 5L)
    assert(withZeros.getDouble(withZeros.fieldIndex("z_w")) == 0.4045)
  }

  test("negating every difference negates z") {
    val r = wsr(Seq(-1L, 2L, -3L, 4L, -5L))
    assert(r.getDouble(r.fieldIndex("z_w")) == -0.4045)
  }

  test("all differences positive: z > 0 and p small at n = 20") {
    val r = wsr((1L to 20L).map(_ * 10L))
    assert(r.getDouble(r.fieldIndex("z_w")) > 3.5)
    assert(r.getDouble(r.fieldIndex("p_value")) < 0.001)
  }

  test("registered q170 at sf0.001: pairs exist, p in [0,1]") {
    val r = SignedRank.customerSpendShift(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(r.getLong(r.fieldIndex("n_pairs")) > 0)
    if (!r.isNullAt(r.fieldIndex("p_value"))) {
      val p = r.getDouble(r.fieldIndex("p_value"))
      assert(p >= 0.0 && p <= 1.0)
    }
  }
}
