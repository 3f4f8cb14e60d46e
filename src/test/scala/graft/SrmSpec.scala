package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Srm

/** Sample-ratio-mismatch guardrail (q250): the cleared-integer GOF
  * identity, the zero-exactly case, spine zero-fill (the missing-arm
  * bug), p monotonicity, and the registered house-split audit.
  * Value-level oracle equivalence runs through graft.Verify. */
class SrmSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fit(counts: Seq[Long], k: Int) = {
    import spark.implicits._
    Srm.chiSquareUniform(
      counts.zipWithIndex.map { case (o, b) => (b.toLong, o) }
        .toDF("b", "o"), k)
      .collect().head
  }

  test("hand identity: chi2 = (k*sum(O^2) - N^2)/N exactly") {
    // (10, 10, 20), k=3: N=40, sum O^2=600 -> (1800-1600)/40 = 5.0
    assert(fit(Seq(10L, 10L, 20L), 3).getDouble(1) == 5.0)
  }

  test("perfectly equal allocation reads exactly 0 with p near 1") {
    val row = fit(Seq.fill(10)(500L), 10)
    assert(row.getDouble(row.fieldIndex("chi2_srm")) == 0.0)
    assert(row.getDouble(row.fieldIndex("p_value")) > 0.9)
  }

  test("a silently missing arm is counted as zero, not skipped") {
    // only arms 0 and 1 report; k=4 must test against 4 cells
    val row = fit(Seq(100L, 100L), 4)
    // N=200, sum O^2=20000 -> (80000-40000)/200 = 200
    assert(row.getDouble(row.fieldIndex("chi2_srm")) == 200.0)
    assert(row.getDouble(row.fieldIndex("p_value")) < 1e-4)
  }

  test("p falls monotonically as imbalance grows") {
    val ps = Seq(
      Seq(500L, 500L, 500L, 500L),
      Seq(520L, 480L, 510L, 490L),
      Seq(600L, 400L, 550L, 450L),
      Seq(900L, 100L, 800L, 200L)).map { cs =>
      val r = fit(cs, 4); r.getDouble(r.fieldIndex("p_value"))
    }
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b }, ps.toString)
  }

  test("registered q250 at sf0.001: the house split is healthy") {
    val row = Srm.orderSplitSrm(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(row.getLong(row.fieldIndex("n_rows")) == 1500L)
    // a correct uniform hash should not trip the guardrail
    assert(row.getDouble(row.fieldIndex("p_value")) > 0.001)
  }
}
