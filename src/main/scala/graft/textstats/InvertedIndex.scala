package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Inverted-index build — term → posting list (doc ids + term
  * frequencies), the storage artifact behind every retrieval stack
  * (BM25 search, RAG candidate generation, contamination lookups).
  * The reference queries Postgres tables; an engine feeding a search
  * tier materializes this index itself.
  *
  * Scale shape — the classic wall is the hot term: `the` appears in
  * every document, so "groupBy(term) + collect postings" puts the
  * whole corpus's hottest posting list in ONE reducer row. Real
  * indexes shard posting lists into doc-id RANGES (block-partitioned
  * postings); here the shard key is `doc_id div ShardSpan`, computed
  * as a PROJECTION — so the aggregate key is (term, shard), hot terms
  * split across shards ∝ corpus size, every shard's list is bounded by
  * ShardSpan, and the collect_list partial-aggregates map-side. Range
  * sharding (not hash) keeps each shard a contiguous, internally
  * sorted doc-id run, so a downstream merge reads shards in order and
  * a conjunctive query intersects lists shard-by-shard.
  *
  * Postings serialize as the canonical `doc:tf` comma string (sorted
  * by doc id inside the shard) — deterministic, and directly
  * comparable against DuckDB's ordered string_agg.
  */
object InvertedIndex {

  /** Doc-id span per posting shard (testdata-scaled; a production
    * index picks spans so a shard's postings fit a block read). */
  val ShardSpan = 100L

  /** Build the sharded inverted index.
    * @return (`term`, `shard_ix`, `df_shard`, `tf_shard`, `postings`). */
  def build(docs: DataFrame, shardSpan: Long = ShardSpan): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    tf.groupBy(col("term"), expr(s"doc_id div $shardSpan").as("shard_ix"))
      .agg(
        count(lit(1)).as("df_shard"),
        sum(col("tf")).as("tf_shard"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("tf")))),
            e => concat(e("doc_id").cast("string"), lit(":"), e("tf").cast("string"))),
          ",").as("postings"))
  }

  /** q79 over the documents table. */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame =
    build(Tables.documents(spark, dir))

  val invertedIndexSql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
       |  GROUP BY 1, 2)
       |SELECT term, doc_id // $ShardSpan AS shard_ix,
       |  count(*) AS df_shard,
       |  CAST(sum(tf) AS BIGINT) AS tf_shard,
       |  string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
       |FROM tf GROUP BY 1, 2""".stripMargin
}
