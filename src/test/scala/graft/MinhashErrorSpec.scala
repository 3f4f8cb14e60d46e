package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import dedup.MinhashError

/** MinHash estimator audit (q235): exact-duplicate pairs estimate
  * perfectly, near-dup errors stay bounded, empty truth → NULLs.
  * Value-level oracle equivalence runs through graft.Verify. */
class MinhashErrorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def err(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    MinhashError.minhashError(docs.toDF("doc_id", "text").repartition(4))
      .collect().head
  }

  private val longA = (1 to 30).map(i => s"tok$i").mkString(" ")

  test("an identical pair estimates jaccard 1 with zero error") {
    val r = err(Seq((1L, longA), (2L, longA)))
    assert(r.getLong(r.fieldIndex("n_pairs")) == 1L)
    assert(r.getDouble(r.fieldIndex("mean_jaccard")) == 1.0)
    assert(r.getDouble(r.fieldIndex("mean_est")) == 1.0)
    assert(r.getDouble(r.fieldIndex("bias")) == 0.0)
    assert(r.getDouble(r.fieldIndex("mae")) == 0.0)
  }

  test("a near-duplicate pair keeps the estimator within gross bounds") {
    // 30 tokens, last one changed: shingle jaccard well above the
    // 0.6 truth threshold but below 1 — the estimator must land in
    // [0, 1] with |bias| ≤ mae ≤ 1 (exact values are deterministic
    // but coefficient-dependent; the oracle hash pins them)
    val nearA = longA
    val nearB = (1 to 29).map(i => s"tok$i").mkString(" ") + " changed"
    val r = err(Seq((1L, nearA), (2L, nearB)))
    assert(r.getLong(r.fieldIndex("n_pairs")) == 1L)
    val est = r.getDouble(r.fieldIndex("mean_est"))
    val mae = r.getDouble(r.fieldIndex("mae"))
    val bias = r.getDouble(r.fieldIndex("bias"))
    assert(est >= 0.0 && est <= 1.0)
    assert(mae >= 0.0 && mae <= 1.0)
    assert(math.abs(bias) <= mae + 1e-6)
    assert(r.getDouble(r.fieldIndex("mean_jaccard")) >= 0.6)
  }

  test("no truth pairs: counts 0, rates NULL") {
    val longB = (1 to 30).map(i => s"other$i").mkString(" ")
    val r = err(Seq((1L, longA), (2L, longB)))
    assert(r.getLong(r.fieldIndex("n_pairs")) == 0L)
    assert(r.isNullAt(r.fieldIndex("mae")))
  }
}
