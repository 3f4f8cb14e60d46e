package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import textstats.InvertedIndex

/** Sharded inverted-index invariants. Value-level equivalence vs the
  * DuckDB string_agg twin runs through graft.Verify. */
class InvertedIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  test("postings are doc-sorted, tf-correct, and shard by doc-id range") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a"),
      (2L, "a c"),
      (150L, "a a a"), // lands in shard 1 at span 100
      (250L, "b"))
      .toDF("doc_id", "text")
    val got = InvertedIndex.build(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(("a", 0L)) == ((2L, 3L, "1:2,2:1")))
    assert(got(("a", 1L)) == ((1L, 3L, "150:3")))
    assert(got(("b", 0L)) == ((1L, 1L, "1:1")))
    assert(got(("b", 2L)) == ((1L, 1L, "250:1")))
    assert(got(("c", 0L)) == ((1L, 1L, "2:1")))
    assert(got.size == 5)
  }

  test("hot-term postings split across shards instead of one reducer row") {
    import spark.implicits._
    // 'the' in every doc across 5 shard spans
    val docs = (0L until 500L by 10L).map(i => (i, s"the w$i")).toDF("doc_id", "text")
    val shards = InvertedIndex.build(docs).filter(col("term") === "the")
    assert(shards.count() == 5)
    // each shard's df is bounded by the docs in its range, not the corpus
    assert(shards.agg(max("df_shard")).head.getLong(0) == 10L)
    assert(shards.agg(sum("df_shard")).head.getLong(0) == 50L)
  }

  test("index reconstructs exact corpus token counts (no loss, no dup)") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val idx = InvertedIndex.build(docs)
    val totalFromIndex = idx.agg(sum("tf_shard")).head.getLong(0)
    val totalFromDocs = docs
      .select(explode(split(col("text"), " ")).as("t")).count()
    assert(totalFromIndex == totalFromDocs)
    // df identity: sum of per-shard dfs = distinct (term, doc) pairs
    val dfSum = idx.agg(sum("df_shard")).head.getLong(0)
    val pairs = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .distinct().count()
    assert(dfSum == pairs)
  }

  test("q79 plan: one exchange on (term, shard), collect_list partial-aggregates") {
    val dir = "/root/testdata/sf0.001"
    val plan = InvertedIndex.invertedIndex(spark, dir)
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate runs partial + final around a single shuffle
    assert(plan.contains("ObjectHashAggregate"))
    assert(!plan.contains("CartesianProduct"))
  }
}
