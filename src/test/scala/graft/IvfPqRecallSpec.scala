package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import ann.IvfPqRecall

/** IVF-PQ recall audit (q241): perfect recall on a separable planted
  * corpus, the recall_worst ≤ recall ≤ 1 ordering, truth-set
  * completeness, and the registered query's field sanity. Value-level
  * oracle equivalence runs through graft.Verify. */
class IvfPqRecallSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  /** Well-separated axis-cluster corpus: vectors bunch tightly around
    * distinct one-hot directions, so every true neighborhood lives in
    * one IVF cell and IVFADC must recover it fully. */
  private def planted = {
    import spark.implicits._
    val dim = ann.Ann.Dim
    val rnd = new scala.util.Random(3)
    // 100 vectors per cluster < IvfPq.Rerank = 128: inside a near-tie
    // cluster the ADC ordering is code-degenerate, so full recall is
    // only GUARANTEED when the whole cluster fits the exact re-rank
    // shortlist — the depth-sizing rule IvfPq's own doc states
    (0 until 400).map { i =>
      val axis = (i % 4) * 7
      val v = Array.tabulate(dim)(d =>
        (if (d == axis) 10.0 else 0.0) + rnd.nextDouble() * 0.01)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("separable clusters: the compressed index recovers the truth fully") {
    val r = IvfPqRecall.ivfPqRecall(planted).collect().head
    assert(r.getDouble(r.fieldIndex("recall")) == 1.0,
      s"recall ${r.getDouble(r.fieldIndex("recall"))}")
    assert(r.getDouble(r.fieldIndex("recall_worst")) == 1.0)
  }

  test("audit invariants: 0 ≤ recall_worst ≤ recall ≤ 1; truth = k per query") {
    val r = IvfPqRecall.docIvfPqRecall(spark, "/root/testdata/sf0.001")
      .collect().head
    val (rec, worst) = (r.getDouble(r.fieldIndex("recall")),
      r.getDouble(r.fieldIndex("recall_worst")))
    assert(worst >= 0.0 && worst <= rec + 1e-9 && rec <= 1.0,
      s"worst $worst recall $rec")
    // the corpus dwarfs k, so every query has a full truth set
    assert(r.getLong(r.fieldIndex("n_truth")) ==
      r.getLong(r.fieldIndex("n_queries")) * ann.Ann.TopK)
    assert(r.getLong(r.fieldIndex("n_hit")) <=
      r.getLong(r.fieldIndex("n_truth")))
  }
}
