package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Tokenizer fertility per slice — the multilingual BUDGET number the
  * token deck (q28 counts, q81 exact BPE) never aggregated: fertility
  * = subword tokens per whitespace word, the standard measure of how
  * expensive a language is under a given tokenizer (fertility 2×
  * means half the effective context window and 2× the training cost
  * per word); chars-per-token is its compression-side twin. Both are
  * quoted per LANGUAGE because that's the axis tokenizers are unfair
  * across.
  *
  * Exactness: all three counts are exact BIGINTs (the q28 whitespace
  * and BPE-regex conventions verbatim — shared pattern constant);
  * slice totals are exact sums; fertility/compression are shared-text
  * divisions. Docs with zero words are excluded and counted.
  *
  * Plan/scale: ONE corpus scan → per-doc counts in the projection
  * (regexp_count — no explode at all) → one keyed slice aggregate. */
object Fertility {

  /** Per-slice fertility from (slice, text). One row per slice:
    * (slice, n_docs, n_excluded, ws_tokens, bpe_tokens, n_chars,
    * fertility, chars_per_token). */
  def fertility(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(col("slice"),
        expr("CAST(size(filter(split(text, ' '), t -> length(t) > 0))" +
          " AS BIGINT)").as("ws"),
        // Column-API literal, NOT an expr-embedded SQL string: the SQL
        // parser consumes the pattern's \s escape (q28 precedent —
        // it uses lit() for exactly this reason)
        regexp_count(col("text"), lit(TextStats.BpePattern))
          .cast("bigint").as("bpe"),
        expr("CAST(length(text) AS BIGINT)").as("ch"))
      .groupBy("slice")
      .agg(
        expr("CAST(sum(CASE WHEN ws > 0 THEN 1 ELSE 0 END) AS BIGINT)")
          .as("n_docs"),
        expr("CAST(sum(CASE WHEN ws > 0 THEN 0 ELSE 1 END) AS BIGINT)")
          .as("n_excluded"),
        expr("CAST(sum(CASE WHEN ws > 0 THEN ws END) AS BIGINT)")
          .as("ws_tokens"),
        expr("CAST(sum(CASE WHEN ws > 0 THEN bpe END) AS BIGINT)")
          .as("bpe_tokens"),
        expr("CAST(sum(CASE WHEN ws > 0 THEN ch END) AS BIGINT)")
          .as("n_chars"))
      .selectExpr("slice", "n_docs", "n_excluded",
        "ws_tokens", "bpe_tokens", "n_chars",
        "round(CAST(bpe_tokens AS DOUBLE)" +
          " / nullif(CAST(ws_tokens AS DOUBLE), 0e0), 6) + 0.0 AS fertility",
        "round(CAST(n_chars AS DOUBLE)" +
          " / nullif(CAST(bpe_tokens AS DOUBLE), 0e0), 6) + 0.0" +
          " AS chars_per_token")

  /** q237: tokenizer fertility per language — which languages pay
    * more subword tokens per word under the q28 segmentation (the
    * context-window fairness read a multilingual mix is tuned on). */
  def langFertility(spark: SparkSession, dir: String): DataFrame =
    fertility(Tables.documents(spark, dir)
      .select(col("lang").as("slice"), col("text")))
      .withColumnRenamed("slice", "lang")

  /** DuckDB twin: identical counts (len(regexp_extract_all) is the
    * regexp_count twin — q28 precedent). */
  val langFertilitySql: String =
    s"""WITH perdoc AS (
       |  SELECT lang AS slice,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      t -> length(t) > 0)) AS BIGINT) AS ws,
       |    CAST(len(regexp_extract_all(text, '${TextStats.BpePattern}'))
       |      AS BIGINT) AS bpe,
       |    CAST(length(text) AS BIGINT) AS ch
       |  FROM documents WHERE text IS NOT NULL),
       |agg AS (
       |  SELECT slice,
       |    CAST(sum(CASE WHEN ws > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN ws > 0 THEN 0 ELSE 1 END) AS BIGINT)
       |      AS n_excluded,
       |    CAST(sum(CASE WHEN ws > 0 THEN ws END) AS BIGINT) AS ws_tokens,
       |    CAST(sum(CASE WHEN ws > 0 THEN bpe END) AS BIGINT) AS bpe_tokens,
       |    CAST(sum(CASE WHEN ws > 0 THEN ch END) AS BIGINT) AS n_chars
       |  FROM perdoc GROUP BY 1)
       |SELECT slice AS lang, n_docs, n_excluded,
       |  ws_tokens, bpe_tokens, n_chars,
       |  round(CAST(bpe_tokens AS DOUBLE)
       |    / nullif(CAST(ws_tokens AS DOUBLE), 0e0), 6) + 0.0 AS fertility,
       |  round(CAST(n_chars AS DOUBLE)
       |    / nullif(CAST(bpe_tokens AS DOUBLE), 0e0), 6) + 0.0
       |    AS chars_per_token
       |FROM agg""".stripMargin
}
