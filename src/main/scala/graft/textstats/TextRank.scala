package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing
import graft.operators.Graph

/** TextRank keyword extraction (Mihalcea & Tarau 2004) — corpus-level
  * keyword ranking as PageRank over the word co-occurrence graph: two
  * words are linked when they appear ADJACENT in a document, and a
  * word is central when it co-occurs with many central words — the
  * graph deck (q65's exact integer PageRank) composed with the text
  * deck (q125's co-occurrence view). The curation use: corpus
  * keywords ranked by graph centrality instead of raw frequency —
  * high-degree hub terms and high-frequency-but-peripheral terms
  * separate, which counting cannot do.
  *
  * Construction: adjacent-token pairs per document (window 1, the
  * original TextRank window floor), self-pairs dropped, pair order
  * normalized (least/greatest) and DEDUPLICATED — the unweighted
  * undirected graph the integer random walk expects — then
  * symmetrized into directed edges. Node ids are [[Hashing.hash48]]
  * of the word (both engines derive the identical id space; the
  * word↔id map is dimension-grade and broadcast back at the end).
  *
  * Exactness: pair extraction is integer/string ops; the walk is
  * q65's micro-mass integer recurrence verbatim ([[Graph.pagerank]] /
  * the [[Graph.pagerankSqlFrom]] builder), so centrality is an exact
  * BIGINT on both engines; the top-k cut orders by (centrality DESC,
  * word) — total, deterministic.
  *
  * Plan/scale: one scan → per-row zip_with pair explode (no token
  * self-join) → a vocabulary-grade distinct; the walk's cost is
  * |vocab-edges|-shaped, untouched by corpus size beyond the distinct.
  */
object TextRank {

  /** Keywords reported. */
  val TopK = 20

  /** q273: TextRank keywords of the documents corpus. */
  def docTextRank(spark: SparkSession, dir: String): DataFrame =
    textRank(Tables.documents(spark, dir))

  /** TextRank over any (text) frame. */
  def textRank(docs: DataFrame): DataFrame = {
    val pairs = docs
      .select(split(col("text"), " ").as("t"))
      .select(explode(expr(
        "filter(zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1)," +
          " (a, b) -> struct(a AS wa, b AS wb)), p -> p.wa <> p.wb)")).as("p"))
      .select(least(col("p.wa"), col("p.wb")).as("wa"),
        greatest(col("p.wa"), col("p.wb")).as("wb"))
      .distinct()
      .localCheckpoint(true) // vocabulary-grade; feeds ids + edges
    val ids = pairs.select(col("wa").as("w"))
      .unionByName(pairs.select(col("wb").as("w")))
      .distinct()
      .withColumn("id", Hashing.hash48(col("w")))
      .localCheckpoint(true)
    val half = pairs
      .join(broadcast(ids.selectExpr("w AS wa", "id AS src")), "wa")
      .join(broadcast(ids.selectExpr("w AS wb", "id AS dst")), "wb")
      .select("src", "dst")
    val edges = half.unionByName(
      half.selectExpr("dst AS src", "src AS dst"))
    Graph.pagerank(edges)
      .join(broadcast(ids), "id")
      .selectExpr("w AS word", "centrality")
      .orderBy(col("centrality").desc, col("word"))
      .limit(TopK)
  }

  /** DuckDB twin: identical pair extraction (positional token join ≡
    * the Spark side's zip_with — same adjacent multiset), identical
    * hash id space, q65's integer walk via the builder, same total
    * order cut. */
  val docTextRankSql: String = Graph.pagerankSqlFrom(
    s"""tok AS (
       |  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
       |bi AS (
       |  SELECT DISTINCT least(a.w, b.w) AS wa, greatest(a.w, b.w) AS wb
       |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
       |  WHERE a.w <> b.w),
       |ids AS (
       |  SELECT w, ${Hashing.hash48Sql("w")} AS id
       |  FROM (SELECT wa AS w FROM bi UNION SELECT wb AS w FROM bi)),
       |edges AS (
       |  SELECT ia.id AS src, ib.id AS dst
       |  FROM bi JOIN ids ia ON ia.w = bi.wa JOIN ids ib ON ib.w = bi.wb
       |  UNION ALL
       |  SELECT ib.id AS src, ia.id AS dst
       |  FROM bi JOIN ids ia ON ia.w = bi.wa JOIN ids ib ON ib.w = bi.wb)"""
      .stripMargin,
    s"""SELECT w AS word, r AS centrality
       |FROM r${Graph.Iters} rr JOIN ids ON ids.id = rr.id
       |ORDER BY centrality DESC, word
       |LIMIT $TopK""".stripMargin)
}
