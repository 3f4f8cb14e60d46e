package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import dedup.LshRecall

/** LSH recall audit (q234): the structural exact-duplicate recall
  * floor, empty-truth NULLs, mixed-corpus accounting. Value-level
  * oracle equivalence runs through graft.Verify. */
class LshRecallSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def rec(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    LshRecall.lshRecall(docs.toDF("doc_id", "text").repartition(4))
      .collect().head
  }

  private val longA = (1 to 30).map(i => s"tok$i").mkString(" ")

  test("identical docs can never be missed: recall = 1 structurally") {
    // identical texts share every minhash, hence every band key
    val r = rec(Seq((1L, longA), (2L, longA)))
    assert(r.getLong(r.fieldIndex("n_truth")) == 1L)
    assert(r.getLong(r.fieldIndex("n_hit")) == 1L)
    assert(r.getDouble(r.fieldIndex("recall")) == 1.0)
  }

  test("no true pairs: recall is NULL, not 0") {
    val longB = (1 to 30).map(i => s"other$i").mkString(" ")
    val r = rec(Seq((1L, longA), (2L, longB)))
    assert(r.getLong(r.fieldIndex("n_truth")) == 0L)
    assert(r.isNullAt(r.fieldIndex("recall")))
  }

  test("mixed corpus: the duplicate pair is found among distractors") {
    val distractors = (3L to 6L).map(i =>
      (i, (1 to 30).map(j => s"d${i}w$j").mkString(" ")))
    val r = rec(Seq((1L, longA), (2L, longA)) ++ distractors)
    assert(r.getLong(r.fieldIndex("n_truth")) == 1L)
    assert(r.getDouble(r.fieldIndex("recall")) == 1.0)
    // precision over candidates stays a valid rate
    val p = r.getDouble(r.fieldIndex("precision_at_t"))
    assert(p > 0.0 && p <= 1.0)
  }
}
