package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Roc

/** ROC grid (q277): hand-computed operating points on a planted
  * separable score, endpoint invariants, degenerate classes, and the
  * registered shape. Value-level oracle equivalence runs through
  * graft.Verify. */
class RocSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def grid(rows: Seq[(Long, Int)]) = {
    import spark.implicits._
    Roc.rocGrid(rows.toDF("score", "y").repartition(4), "score", "y")
      .collect().map(r => r.getInt(r.fieldIndex("k")) -> r).toMap
  }

  test("perfectly separable score: a threshold with J = 1e6 exists") {
    // positives all score 100, negatives all score 0
    val rows = (1 to 40).map(i => (if (i <= 20) 100L else 0L, if (i <= 20) 1 else 0))
    val g = grid(rows)
    assert(g.size == Roc.Steps + 1)
    val js = g.values.map(r => r.getLong(r.fieldIndex("youden_ppm")))
    assert(js.max == 1000000L)
    // k = 0 threshold is smin: everything predicted positive
    val r0 = g(0)
    assert(r0.getLong(r0.fieldIndex("tpr_ppm")) == 1000000L)
    assert(r0.getLong(r0.fieldIndex("fpr_ppm")) == 1000000L)
  }

  test("hand-computed middle point on an interleaved score") {
    // scores 0..9; positives at 5..9, negatives at 0..4, one row each.
    // smin=0, smax=9; at k=12: thr = 0 + (9*12) div 20 = 5 →
    // tp = 5 (scores 5..9), fp = 0 → tpr 1e6, fpr 0.
    val rows = (0 to 9).map(s => (s.toLong, if (s >= 5) 1 else 0))
    val g = grid(rows)
    val r = g(12)
    assert(r.getLong(r.fieldIndex("thr")) == 5L)
    assert(r.getLong(r.fieldIndex("tp")) == 5L)
    assert(r.getLong(r.fieldIndex("fp")) == 0L)
    assert(r.getLong(r.fieldIndex("youden_ppm")) == 1000000L)
  }

  test("TPR and FPR are non-increasing in k (threshold monotonicity)") {
    val rows = (0 until 200).map(i => ((i * 7 % 50).toLong, i % 3 min 1))
    val g = grid(rows)
    val byK = (0 to Roc.Steps).map(g)
    val tprs = byK.map(r => r.getLong(r.fieldIndex("tpr_ppm")))
    val fprs = byK.map(r => r.getLong(r.fieldIndex("fpr_ppm")))
    assert(tprs.zip(tprs.tail).forall { case (a, b) => a >= b })
    assert(fprs.zip(fprs.tail).forall { case (a, b) => a >= b })
  }

  test("single-class input: rate for the empty class is NULL") {
    val g = grid((1 to 10).map(i => (i.toLong, 1)))
    val r = g(0)
    assert(r.getLong(r.fieldIndex("tpr_ppm")) == 1000000L)
    assert(r.isNullAt(r.fieldIndex("fpr_ppm")))
    assert(r.isNullAt(r.fieldIndex("youden_ppm")))
  }

  test("registered shape: 21 rows over the q83 scored frame") {
    val df = Roc.qualityRoc(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq ==
      Seq("k", "thr", "tp", "fp", "tpr_ppm", "fpr_ppm", "youden_ppm"))
    assert(df.count() == Roc.Steps + 1)
  }
}
