package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.McNemar

/** McNemar paired-proportions test (q169): hand-computed discordant
  * cells, symmetry, and the degenerate guard. Value-level oracle
  * equivalence runs through graft.Verify. */
class McNemarSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def mc(pairs: Seq[(Int, Int)]) = {
    import spark.implicits._
    McNemar.mcnemar(pairs.toDF("x_a", "x_b").repartition(3)).collect().head
  }

  test("hand case: b = 6, c = 2 → z = 4/√8 = 1.4142, p ≈ 0.1573") {
    // 5 concordant-yes, 3 concordant-no, 6 flips up, 2 flips down
    val pairs = Seq.fill(5)((1, 1)) ++ Seq.fill(3)((0, 0)) ++
      Seq.fill(6)((0, 1)) ++ Seq.fill(2)((1, 0))
    val r = mc(pairs)
    assert(r.getLong(r.fieldIndex("n_pairs")) == 16L)
    assert(r.getLong(r.fieldIndex("both_yes")) == 5L)
    assert(r.getLong(r.fieldIndex("b_disc")) == 6L)
    assert(r.getLong(r.fieldIndex("c_disc")) == 2L)
    assert(r.getDouble(r.fieldIndex("z_mcnemar")) == 1.4142)
    assert(math.abs(r.getDouble(r.fieldIndex("p_value")) - 0.1573) < 5e-4)
  }

  test("concordant pairs carry no evidence: adding them leaves z unchanged") {
    val discordant = Seq.fill(6)((0, 1)) ++ Seq.fill(2)((1, 0))
    val r1 = mc(discordant)
    val r2 = mc(discordant ++ Seq.fill(50)((1, 1)) ++ Seq.fill(50)((0, 0)))
    assert(r1.getDouble(r1.fieldIndex("z_mcnemar")) ==
      r2.getDouble(r2.fieldIndex("z_mcnemar")))
  }

  test("reversed flips negate z") {
    val r = mc(Seq.fill(2)((0, 1)) ++ Seq.fill(6)((1, 0)))
    assert(r.getDouble(r.fieldIndex("z_mcnemar")) == -1.4142)
  }

  test("no discordant pairs: NULL z/p, not garbage") {
    val r = mc(Seq.fill(4)((1, 1)) ++ Seq.fill(4)((0, 0)))
    assert(r.isNullAt(r.fieldIndex("z_mcnemar")))
    assert(r.isNullAt(r.fieldIndex("p_value")))
  }

  test("registered q169 at sf0.001: pairs exist, p in [0,1]") {
    val r = McNemar.customerUrgencyShift(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(r.getLong(r.fieldIndex("n_pairs")) > 0)
    if (!r.isNullAt(r.fieldIndex("p_value"))) {
      val p = r.getDouble(r.fieldIndex("p_value"))
      assert(p >= 0.0 && p <= 1.0)
    }
  }
}
