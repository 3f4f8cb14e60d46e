package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Paragraph-level exact dedup — the CCNet / RefinedWeb pipeline rung:
  * hash every paragraph, keep only the globally FIRST occurrence of
  * each, drop later repeats (boilerplate headers, navigation chrome,
  * license blocks — the mass of web-crawl duplication lives BETWEEN
  * the document level q19 catches and the substring level q62/q63
  * catch), and rebuild the cleaned text. Completes the dedup ladder:
  * document (q19/q20/q21) → paragraph (this) → substring (q62/q63) →
  * semantic (q56).
  *
  * First-occurrence election is the q63 technique: ONE
  * map-side-combined `min` per paragraph hash — never a window over
  * the hash key, so a paragraph repeated 1e8× partial-aggregates to
  * one row per partition instead of landing one hot task. The
  * election key packs (doc_id, para_ix) into a single Long
  * (`doc_id·1e6 + ix` — valid while docs hold < 1e6 paragraphs, which
  * a 100 TB web corpus satisfies per-document by orders); a corpus
  * with larger ids swaps in `min(struct(doc_id, ix))`, same plan.
  *
  * The testdata corpus carries no newlines, so "paragraphs" are
  * deterministic [[ParaTokens]]-token blocks; production input splits
  * on '\n' instead — one expression swap, identical shape.
  */
object Paragraphs {

  val ParaTokens = 10

  /** Paragraph dedup over (doc_id, text).
    * @return (doc_id, n_paras, n_kept, cleaned_text) — cleaned_text
    *         NULL when every paragraph was a repeat.
    * @note texts are assumed non-empty (the documents schema
    *       guarantees n_chars > 0). An empty text would yield a single
    *       EMPTY paragraph, and if that paragraph were the kept global
    *       first, Spark's `nullif(array_join(...), '')` and DuckDB's
    *       `string_agg` would disagree on '' vs NULL — pre-filter
    *       empty texts before calling on a corpus that can carry
    *       them. */
  /** The (doc_id, para_ix, para) paragraph frame shared by the exact
    * (q85) and fuzzy (q339) dedup paths. */
  private def paraFrame(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, CAST(ceil(size(tk) / $ParaTokens.0) AS INT) - 1)," +
            s" i -> array_join(slice(tk, i * $ParaTokens + 1, $ParaTokens), ' '))")))
      .select(col("doc_id"), col("pos").as("para_ix"), col("col").as("para"))

  /** Per-doc rebuild from a (doc_id, para_ix, para, keep) frame —
    * the q85 output shape. */
  private def rebuild(kept: DataFrame): DataFrame =
    kept
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_paras"),
        sum(col("keep").cast("long")).as("n_kept"),
        nullif(
          array_join(
            transform(
              filter(array_sort(collect_list(
                struct(col("para_ix"), col("keep"), col("para")))),
                s => s("keep")),
              s => s("para")),
            " "),
          lit("")).as("cleaned_text"))

  def dedupParagraphs(docs: DataFrame): DataFrame = {
    val paras = paraFrame(docs)
    val firsts = paras
      .groupBy(md5(col("para")).as("h"))
      .agg(min(col("doc_id") * 1000000L + col("para_ix")).as("fr"))
    rebuild(paras
      .join(firsts, md5(col("para")) === col("h"))
      .withColumn("keep", col("doc_id") * 1000000L + col("para_ix") === col("fr")))
  }

  /** q85 over the documents table. */
  def dedupParagraphs(spark: SparkSession, dir: String): DataFrame =
    dedupParagraphs(Tables.documents(spark, dir))

  val dedupParagraphsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |paras AS (
       |  SELECT doc_id, i AS para_ix,
       |    array_to_string(tk[(i * $ParaTokens + 1):((i + 1) * $ParaTokens)], ' ') AS para
       |  FROM (
       |    SELECT doc_id, tk,
       |      unnest(generate_series(0, CAST(ceil(len(tk) / $ParaTokens.0) AS INT) - 1)) AS i
       |    FROM toks)),
       |firsts AS (
       |  SELECT md5(para) AS h, min(doc_id * 1000000 + para_ix) AS fr
       |  FROM paras GROUP BY 1),
       |kept AS (
       |  SELECT p.doc_id, p.para_ix, p.para,
       |    (p.doc_id * 1000000 + p.para_ix) = f.fr AS keep
       |  FROM paras p JOIN firsts f ON md5(p.para) = f.h)
       |SELECT doc_id, count(*) AS n_paras,
       |  CAST(sum(CAST(keep AS INT)) AS BIGINT) AS n_kept,
       |  string_agg(CASE WHEN keep THEN para END, ' ' ORDER BY para_ix) AS cleaned_text
       |FROM kept GROUP BY doc_id""".stripMargin

  // ---- q339: paragraph-level NEAR-dup (r16 verdict #6) ----

  /** Fuzzy paragraph dedup — the CCNet/RefinedWeb rung q85's exact
    * hash misses: boilerplate that varies by a token (dates in
    * footers, session ids in chrome) never hash-equals, but its
    * MinHash bands collide. The q20 machinery runs verbatim over the
    * PARAGRAPH frame: each paragraph (packed id doc_id·10⁶ + ix — the
    * q85 election key) gets K=16 min-hashes → 4 LSH band buckets, and
    * a paragraph is DROPPED when ANY of its buckets contains an
    * earlier paragraph (global-first election, the deterministic
    * greedy rule — exact duplicates share every band, so this
    * subsumes q85's exact election; near-dups need only one colliding
    * band). Output = q85's shape over the fuzzy keep set.
    *
    * Scale shape: signatures are a pure projection per paragraph (no
    * per-shingle explosion); shuffles are the bucket groupBy on tiny
    * (band, band_key) rows, the per-paragraph min, and the doc-level
    * rebuild — exactly the q20 plan plus one aggregate, hot buckets
    * split by AQE skew handling. */
  def dedupParagraphsFuzzy(docs: DataFrame): DataFrame = {
    val paras = paraFrame(docs)
    val pids = paras.select(
      (col("doc_id") * 1000000L + col("para_ix")).as("doc_id"),
      col("para").as("text"))
    // TWO consumers (bucketMin aggregate + the firstOf join) and
    // ReusedExchange does not cover the fan-out — unpinned, the whole
    // md5 minhash/banding pipeline re-ran per consumer (the q193
    // lesson, r17 optimization round; same rows out, hash-gate green)
    val buckets = Dedup.bandedSignatures(pids).localCheckpoint(true)
    val bucketMin = buckets
      .groupBy(col("band"), col("band_key"))
      .agg(min(col("doc_id")).as("bmin"))
    val firstOf = buckets
      .join(bucketMin, Seq("band", "band_key"))
      .groupBy(col("doc_id").as("pid"))
      .agg(min(col("bmin")).as("first_pid"))
    rebuild(paras
      .join(firstOf,
        col("doc_id") * 1000000L + col("para_ix") === col("pid"))
      .withColumn("keep", col("first_pid") === col("pid")))
  }

  /** q339 over the documents table. */
  def dedupParagraphsFuzzy(spark: SparkSession, dir: String): DataFrame =
    dedupParagraphsFuzzy(Tables.documents(spark, dir))

  /** DuckDB twin of [[dedupParagraphsFuzzy]]: q85's paragraph CTEs +
    * the q20 bucket CTEs over the packed-id paragraph frame + the
    * same two-aggregate election. */
  val dedupParagraphsFuzzySql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |paras AS (
       |  SELECT doc_id, i AS para_ix,
       |    array_to_string(tk[(i * $ParaTokens + 1):((i + 1) * $ParaTokens)], ' ') AS para
       |  FROM (
       |    SELECT doc_id, tk,
       |      unnest(generate_series(0, CAST(ceil(len(tk) / $ParaTokens.0) AS INT) - 1)) AS i
       |    FROM toks)),
       |pf AS (
       |  SELECT doc_id * 1000000 + para_ix AS doc_id, para AS text FROM paras),
       |${Dedup.bucketsCtesSqlFrom("pf")},
       |bmin AS (
       |  SELECT band, band_key, min(doc_id) AS bmin
       |  FROM buckets GROUP BY 1, 2),
       |firstof AS (
       |  SELECT b.doc_id AS pid, min(m.bmin) AS first_pid
       |  FROM buckets b JOIN bmin m USING (band, band_key) GROUP BY 1),
       |kept AS (
       |  SELECT p.doc_id, p.para_ix, p.para, f.first_pid = f.pid AS keep
       |  FROM paras p
       |  JOIN firstof f ON f.pid = p.doc_id * 1000000 + p.para_ix)
       |SELECT doc_id, count(*) AS n_paras,
       |  CAST(sum(CAST(keep AS INT)) AS BIGINT) AS n_kept,
       |  string_agg(CASE WHEN keep THEN para END, ' ' ORDER BY para_ix) AS cleaned_text
       |FROM kept GROUP BY doc_id""".stripMargin
}
