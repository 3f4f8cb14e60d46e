package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Flesch readability — the CURATION-grade text-difficulty signal the
  * quality deck was missing: q27 reads surface ratios, q61 scores
  * hashed features, q74 scores bigram fluency; Flesch Reading Ease
  * and the Flesch–Kincaid grade are the standard audience-level
  * numbers a corpus-mix report quotes ("is this slice textbook or
  * tabloid"), built from three exact counts per document:
  *
  *   FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
  *   FKG = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59
  *
  * Syllables are the classic vowel-group estimate (runs of
  * [aeiouy]+ per lowercased token, min 1 per word) — the documented
  * public heuristic; sentences are terminator runs [.!?]+ with a
  * floor of 1 (the synthetic corpus has NO terminators, so the
  * registered output reads one sentence per doc — the floor, the
  * spec exercises punctuated text).
  *
  * Exactness: words/sentences/syllables are exact BIGINT counts
  * (identical regex semantics — plain character classes — in both
  * engines); per-doc FRE/FKG are shared-text rational chains floored
  * to 1e-6 micro-units and summed as BIGINTs (the q91 move); the
  * slice-level "pooled" scores recompute the same chains on the
  * summed counts — both reported, since mean-of-docs and pooled
  * deliberately differ (documented, both exact).
  *
  * Plan/scale: ONE corpus scan — the explode feeds a per-doc
  * aggregate (map-side combined), then one keyed slice aggregate.
  * No windows, no joins. */
object Readability {

  private val WsSql = "(CAST(w AS DOUBLE) / CAST(s AS DOUBLE))"
  private val YwSql = "(CAST(y AS DOUBLE) / CAST(w AS DOUBLE))"
  private val FreSql = s"(206.835 - 1.015 * $WsSql - 84.6 * $YwSql)"
  private val FkgSql = s"(0.39 * $WsSql + 11.8 * $YwSql - 15.59)"

  /** Per-doc exact counts (doc_id, slice, w, s, y) from (doc_id,
    * slice, text). */
  def counts(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("slice"),
        expr("greatest(CAST(1 AS BIGINT)," +
          " CAST(size(regexp_extract_all(text, '[.!?]+', 0)) AS BIGINT))")
          .as("s"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("doc_id", "slice", "s")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("w"),
        expr("CAST(sum(greatest(CAST(1 AS BIGINT)," +
          " CAST(size(regexp_extract_all(lower(tok), '[aeiouy]+', 0))" +
          " AS BIGINT))) AS BIGINT)").as("y"))

  /** Readability per slice: exact count totals, the pooled FRE/FKG on
    * them, and the mean of per-doc FRE (micro-summed). Docs with ZERO
    * words (all-whitespace text) produce no token rows, so they carry
    * no counts and no per-doc FRE (undefined) — they are reported in
    * `n_excluded` (slice input docs minus scoring docs, the Fertility
    * convention; r13 ADVICE: the previous build dropped them
    * SILENTLY, which at corpus scale is an invisible data-loss mode).
    * `n_docs` counts only scoring docs — the fre_mean denominator. */
  def readability(docs: DataFrame): DataFrame = {
    val input = docs.filter(col("text").isNotNull)
    val perSlice = input.groupBy("slice")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_input"))
    val agg = counts(input)
      // w = count(1) >= 1 by construction (zero-word docs never reach
      // the aggregate), so per-doc FRE needs no w guard here
      .withColumn("fre_i", expr(s"CAST(floor($FreSql * 1e6) AS BIGINT)"))
      .groupBy("slice")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_docs"),
        expr("CAST(sum(w) AS BIGINT)").as("w"),
        expr("CAST(sum(s) AS BIGINT)").as("s"),
        expr("CAST(sum(y) AS BIGINT)").as("y"),
        expr("CAST(sum(fre_i) AS BIGINT)").as("sfre_i"))
    perSlice.join(agg, Seq("slice"), "left")
      .selectExpr("slice",
        "coalesce(n_docs, CAST(0 AS BIGINT)) AS n_docs",
        "n_input - coalesce(n_docs, CAST(0 AS BIGINT)) AS n_excluded",
        "w AS words", "s AS sentences", "y AS syllables",
        s"round($FreSql, 4) + 0.0 AS fre_pooled",
        s"round($FkgSql, 4) + 0.0 AS fk_grade_pooled",
        "round(CAST(sfre_i AS DOUBLE) / 1e6 / CAST(n_docs AS DOUBLE), 4)" +
          " + 0.0 AS fre_mean")
  }

  /** q221: readability per language slice — the audience-level lens
    * on the same corpus q26/q27/q61 grade; a slice whose FRE drifts
    * is changing REGISTER even when its quality score holds. */
  def docReadability(spark: SparkSession, dir: String): DataFrame =
    readability(Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang").as("slice"), col("text")))
      .withColumnRenamed("slice", "lang")

  /** DuckDB twin: identical regex counts and shared chains, incl. the
    * n_excluded accounting (input docs minus scoring docs). */
  val docReadabilitySql: String =
    s"""WITH inp AS (
       |  SELECT lang AS slice, CAST(count(*) AS BIGINT) AS n_input
       |  FROM documents WHERE text IS NOT NULL GROUP BY 1),
       |toks AS (
       |  SELECT doc_id, lang AS slice,
       |    greatest(CAST(1 AS BIGINT),
       |      CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS s,
       |    unnest(string_split(text, ' ')) AS tok
       |  FROM documents WHERE text IS NOT NULL),
       |perdoc AS (
       |  SELECT doc_id, slice, s,
       |    CAST(count(*) AS BIGINT) AS w,
       |    CAST(sum(greatest(CAST(1 AS BIGINT),
       |      CAST(len(regexp_extract_all(lower(tok), '[aeiouy]+'))
       |      AS BIGINT))) AS BIGINT) AS y
       |  FROM toks WHERE length(tok) > 0
       |  GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT *, CAST(floor($FreSql * 1e6) AS BIGINT) AS fre_i
       |  FROM perdoc),
       |agg AS (
       |  SELECT slice, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(w) AS BIGINT) AS w, CAST(sum(s) AS BIGINT) AS s,
       |    CAST(sum(y) AS BIGINT) AS y,
       |    CAST(sum(fre_i) AS BIGINT) AS sfre_i
       |  FROM scored GROUP BY 1)
       |SELECT i.slice AS lang,
       |  coalesce(n_docs, CAST(0 AS BIGINT)) AS n_docs,
       |  i.n_input - coalesce(n_docs, CAST(0 AS BIGINT)) AS n_excluded,
       |  w AS words, s AS sentences, y AS syllables,
       |  round($FreSql, 4) + 0.0 AS fre_pooled,
       |  round($FkgSql, 4) + 0.0 AS fk_grade_pooled,
       |  round(CAST(sfre_i AS DOUBLE) / 1e6 / CAST(n_docs AS DOUBLE), 4)
       |    + 0.0 AS fre_mean
       |FROM inp i LEFT JOIN agg a ON i.slice = a.slice""".stripMargin
}
