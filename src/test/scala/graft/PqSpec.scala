package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import ann.{Ann, Pq}

/** PQ ANN invariants. Value-level equivalence vs the unrolled DuckDB
  * twin runs through graft.Verify + tools/verify_local.py. */
class PqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("codebooks: M*Ks entries of SubDim dims, deterministic across fits") {
    val emb = Tables.embeddings(spark, dir)
    val a = Pq.fit(emb)
    val b = Pq.fit(emb)
    assert(a.size == Pq.M * Pq.Ks)
    assert(a.forall(_._3.size == Pq.SubDim))
    assert(a == b)
  }

  test("persisted indexes reproduce identical artifacts and identical top-k") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-index").toString
    val emb = Tables.embeddings(spark, dir)
    // PQ codebooks round-trip: structural equality and identical encoding
    val books = Pq.fit(emb)
    ann.IndexStore.saveCodebooks(spark, books, s"$tmp/books")
    val books2 = ann.IndexStore.loadCodebooks(spark, s"$tmp/books")
    assert(books2 == books)
    val enc1 = Pq.encode(emb, books).collect().map(_.toSeq).toSet
    val enc2 = Pq.encode(emb, books2).collect().map(_.toSeq).toSet
    assert(enc1 == enc2)
    // IVF centroids round-trip: identical top-k from the persisted index
    val cents = Ann.fitCentroids(emb)
    ann.IndexStore.saveCentroids(spark, cents, s"$tmp/cents")
    val cents2 = ann.IndexStore.loadCentroids(spark, s"$tmp/cents")
    assert(cents2 == cents)
    val topk1 = Ann.annIvf(emb, cents).collect().map(_.toSeq).toSet
    val topk2 = Ann.annIvf(emb, cents2).collect().map(_.toSeq).toSet
    assert(topk1 == topk2 && topk1.nonEmpty)
    // a wrong artifact fails loudly, not silently
    intercept[IllegalArgumentException] {
      ann.IndexStore.loadCentroids(spark, s"$tmp/books")
    }
  }

  test("codes cover the corpus: one wide row per vector, codes in [0, Ks)") {
    val emb = Tables.embeddings(spark, dir)
    val codes = Pq.encode(emb, Pq.fit(emb)).cache()
    assert(codes.count() == emb.count())
    (0 until Pq.M).foreach { m =>
      assert(codes.filter(col(s"c$m") < 0 || col(s"c$m") >= Pq.Ks).count() == 0)
    }
    codes.unpersist()
  }

  test("ADC cosines are true cosines of the reconstruction: within [-1, 1]") {
    val out = Pq.annPq(spark, dir).cache()
    assert(out.filter(col("cos") > 1.0001 || col("cos") < -1.0001).count() == 0)
    // TopK rows per query, ranks 1..TopK
    val perQuery = out.groupBy("query_id").count()
    assert(perQuery.filter(col("count") =!= Ann.TopK).count() == 0)
    out.unpersist()
  }

  test("recall@5 vs brute force clears the 16-centroid floor") {
    val pq = Pq.annPq(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Ann.annBrute(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq intersect brute).size.toDouble / brute.size
    // ADC shortlist (top-50 of ~500) + exact re-rank: each final rank
    // is exact cosine, so recall is bounded only by shortlist coverage
    assert(recall >= 0.4, s"recall@5 = $recall")
  }
}
