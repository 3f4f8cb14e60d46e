package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import textstats.Bm25

/** BM25 ranking invariants on planted corpora. Value-level oracle
  * equivalence runs through graft.Verify. */
class Bm25Spec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def run(docs: Seq[(Long, String)], queries: Seq[(Long, String)]) = {
    import spark.implicits._
    Bm25.search(
      docs.toDF("doc_id", "text"),
      queries.toDF("qid", "term"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
  }

  test("rarer term outranks common term; matching doc outranks non-matching") {
    val docs = Seq(
      (1L, "spark spark common"),   // hits rare 'spark' twice
      (2L, "spark common common"),  // hits once
      (3L, "common common common"), // no rare hits
      (4L, "other words only"))
    val got = run(docs, Seq((10L, "spark")))
    // only docs containing 'spark' appear, tf-descending
    assert(got.map(_._2).toSeq == Seq(1L, 2L))
    assert(got.head._4 > got(1)._4)
  }

  test("length normalization: same tf, shorter doc wins") {
    val docs = Seq(
      (1L, "hit a b"),
      (2L, "hit a b c d e f g h i j k l m n o p"),
      (3L, "filler filler filler"))
    val got = run(docs, Seq((10L, "hit")))
    assert(got.map(_._2).toSeq == Seq(1L, 2L))
  }

  test("multi-term queries sum per-term scores; ranks dense from 1") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha gamma"), (3L, "beta gamma"),
      (4L, "alpha beta gamma"))
    val got = run(docs, Seq((10L, "alpha"), (10L, "beta")))
    assert(got.map(_._3).sorted.toSeq == (1 to got.length).toSeq)
    // doc 4 matches both but is longer than doc 1 (both terms, 2 tokens)
    val byDoc = got.map(g => g._2 -> g._4).toMap
    assert(byDoc(1L) > byDoc(4L))
    assert(Set(1L, 2L, 3L, 4L).subsetOf(byDoc.keySet))
  }

  test("q90 MRR agrees exactly with a driver-side recompute from the q82 run") {
    // NOTE the testdata vocabulary is ~100 common words, so query terms
    // are corpus-wide and the known-item target rarely tops the list —
    // MRR is LOW here by corpus construction, which is exactly what the
    // metric is for; the spec asserts exact agreement, not retrieval
    // quality
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val queries = Bm25.deriveQueries(docs)
    val res = Bm25.search(docs, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val nq = queries.select("qid").distinct().count()
    val want = res.collect { case (q, d, rk) if q == d => 1000000L / rk }.sum / nq
    val wantHits = res.count { case (q, d, _) => q == d }
    val r = Bm25.mrr(spark, dir).head
    assert(r.getLong(0) == nq)
    assert(r.getLong(1) == wantHits.toLong)
    assert(r.getLong(2) == want)
    assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000000L)
  }

  test("q82 over testdata: k bounded, scores positive, ranks deterministic") {
    val df = Bm25.bm25(spark, "/root/testdata/sf0.001").cache()
    val agg = df.groupBy("qid").agg(count(lit(1)).as("n"), max("rk").as("mx"))
      .collect()
    assert(agg.nonEmpty)
    agg.foreach { r =>
      assert(r.getLong(1) <= Bm25.TopK)
      assert(r.getInt(2).toLong == r.getLong(1)) // ranks dense 1..n
    }
    assert(df.filter(col("score_micro") <= 0).count() == 0)
  }
}
