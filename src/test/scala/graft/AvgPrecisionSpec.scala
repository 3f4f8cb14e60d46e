package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.{AvgPrecision, Eval}

/** Average precision (q171): hand-computed rankings incl. the block
  * tie convention, the perfect/worst bounds, and the AP-vs-AUC
  * divergence AP exists to expose. Value-level oracle equivalence
  * runs through graft.Verify. */
class AvgPrecisionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def ap(rows: Seq[(Long, Int)]) = {
    import spark.implicits._
    AvgPrecision.apMicro(rows.toDF("s", "y").repartition(3), "s", "y")
      .collect().head
  }

  test("hand case [1, 0, 1] by descending score: AP = 833333 micro") {
    // blocks: (TP=1,N=1) term 1e6; (TP=2,N=3) term 666666 → ap 833333
    val r = ap(Seq((30L, 1), (20L, 0), (10L, 1)))
    assert(r.getLong(r.fieldIndex("ap_micro")) == 833333L)
    assert(r.getLong(r.fieldIndex("base_micro")) == 666666L)
  }

  test("perfect ranking: AP = 1; worst ranking is prevalence-floored") {
    val perfect = ap(Seq((30L, 1), (20L, 1), (10L, 0)))
    assert(perfect.getLong(perfect.fieldIndex("ap_micro")) == 1000000L)
    // positives last: AP = (1/2)·[(1e6·1·1)/2? — blocks: neg first
    // (t=0), then (t=1,TP=1,N=2) 500000, (t=1,TP=2,N=3) 666666 → 583333
    val worst = ap(Seq((30L, 0), (20L, 1), (10L, 1)))
    assert(worst.getLong(worst.fieldIndex("ap_micro")) == 583333L)
  }

  test("tied block convention: one block [1,0] → AP = 500000") {
    val r = ap(Seq((10L, 1), (10L, 0)))
    assert(r.getLong(r.fieldIndex("ap_micro")) == 500000L)
  }

  test("no positives: NULL ap, base 0") {
    val r = ap(Seq((10L, 0), (20L, 0)))
    assert(r.isNullAt(r.fieldIndex("ap_micro")))
    assert(r.getLong(r.fieldIndex("base_micro")) == 0L)
  }

  test("AP punishes a top-heavy mistake AUC shrugs at") {
    // 1 negative at the very top of 6; vs the same negative at rank 5
    val topHeavy = ap(Seq((60L, 0), (50L, 1), (40L, 1), (30L, 1), (20L, 1), (10L, 0)))
    val midNeg = ap(Seq((60L, 1), (50L, 1), (40L, 1), (30L, 1), (20L, 0), (10L, 0)))
    assert(topHeavy.getLong(topHeavy.fieldIndex("ap_micro")) <
      midNeg.getLong(midNeg.fieldIndex("ap_micro")))
  }

  test("registered q171 at sf0.001: same frame as q83, AP above prevalence") {
    val r = AvgPrecision.qualityAp(spark, "/root/testdata/sf0.001").collect().head
    val auc = Eval.qualityAuc(spark, "/root/testdata/sf0.001").collect().head
    assert(r.getLong(r.fieldIndex("n_pos")) ==
      auc.getLong(auc.fieldIndex("n_pos")))
    assert(r.getLong(r.fieldIndex("n_neg")) ==
      auc.getLong(auc.fieldIndex("n_neg")))
    assert(r.getLong(r.fieldIndex("ap_micro")) > 0L)
  }
}
