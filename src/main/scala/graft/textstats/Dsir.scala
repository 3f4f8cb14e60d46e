package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169) — the corpus-selection step that samples raw data
  * proportionally to how target-like it looks under hashed n-gram
  * bag-of-words models: weight(x) ≈ p_target(x) / p_raw(x), estimated
  * per hashed feature bucket, then resample with acceptance ∝ weight.
  *
  * Deterministic integer re-expression (no logs, no RNG):
  *
  *   ratio_b = ((ct_b + 1) · 1e6) div (cr_b + 1)          add-1 smoothed
  *   F       = ((Tr + B) · 1e6) div (Tt + B)              total correction
  *   w_b     = (ratio_b · F) div 1e6                       ≈ 1e6·p_t(b)/p_r(b)
  *   score_d = (Σ_tokens w_b) div n_tok_d                  mean token weight
  *   keep d ⟺ hash(doc_id) % 1e6 < min(1e6, (score_d·1e6) div (2·s̄))
  *
  * (the paper sums log-ratios; the mean-of-ratios form keeps every step
  * in exact Long arithmetic so the DuckDB oracle matches bit-for-bit,
  * and acceptance ∝ score with expected keep-rate ≈ ½ via the global
  * mean s̄). Membership is the q38 hash-threshold rule — a pure function
  * of doc_id, reproducible across re-runs and re-crawls. The target
  * here is the `lang = 'en'` slice (a production run feeds a curated
  * reference corpus through the same two frames).
  *
  * Since the target is a subset of the corpus, ct ≤ cr and ratio_b ≤
  * ~1e6; headroom: safe for target corpora to ~9e11 tokens
  * ((ct+1)·1e6 < 2^63) and target shares down to ~0.1% of raw (F ≤
  * 1e9 ⇒ ratio·F ≤ 1e15); beyond that, move the two scaling constants
  * to DECIMAL(38) — plan shape unchanged.
  *
  * Plan (the DSIR fit-then-apply two-pass): pass 1 tokenizes and
  * builds per-bucket target/raw counts in ONE map-side-combined
  * aggregate (B = 4096 rows out — dimension-grade); weights derive
  * in-frame from a 1-row totals cross join. Pass 2 re-tokenizes,
  * BROADCAST-joins the 4096-row weight table, and aggregates per doc;
  * per-doc scores are doc-grade and localCheckpointed so the global
  * mean and the final filter reuse them without a third scan. The
  * corpus itself is never shuffled — only (doc_id, partial sums).
  */
object Dsir {

  /** Hashed feature-space size (shared recipe with q61). */
  val B = 4096L
  /** Fixed-point scale for the ratio arithmetic. */
  val RScale = 1000000L
  /** Sampling-bucket space — the q38/q60 membership rule. */
  val SampleBuckets = 1000000L

  private def toks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), (col("lang") === "en").as("is_t"),
        explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), col("is_t"),
        (Hashing.hash48(col("tok")) % B).as("b"))

  /** q67: importance-resampled corpus — kept rows with their integer
    * importance score. */
  def importanceResample(docs: DataFrame): DataFrame = {
    val t = toks(docs)
    val stats = t.groupBy("b").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
      // bucket-dimension, reused by the totals AND the weight frame:
      // checkpoint so the corpus tokenization feeds it once (no CSE
      // across repeated frames)
      .localCheckpoint(true)
    val tot = stats.agg(sum("ct").as("tt"), sum("cr").as("tr"))
    val wt = stats.crossJoin(broadcast(tot)).selectExpr("b",
      s"(((ct + 1) * $RScale) div (cr + 1)) * " +
        s"(((tr + $B) * $RScale) div (tt + $B)) div $RScale AS w")
    val scores = t.join(broadcast(wt), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum("w").as("wsum"))
      .selectExpr("doc_id", "wsum div n_tok AS score")
      .localCheckpoint(true) // doc-grade; reused by the mean AND the filter
    val sbar = scores.agg(
      greatest(lit(1L), expr("sum(score) div count(*)")).as("sb"))
    docs.select(col("doc_id"), col("lang"), col("source"))
      .join(scores, "doc_id")
      .crossJoin(broadcast(sbar))
      .filter(Hashing.hash48(col("doc_id").cast("string")) % SampleBuckets <
        least(lit(SampleBuckets), expr(s"(score * $SampleBuckets) div (2 * sb)")))
      .select(col("doc_id"), col("lang"), col("source"), col("score"))
  }

  def importanceResample(spark: SparkSession, dir: String): DataFrame =
    importanceResample(Tables.documents(spark, dir))

  /** DuckDB twin: the identical integer expression tree. */
  val importanceResampleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, (lang = 'en') AS is_t,
       |    ${Hashing.hash48Sql("tok")} % $B AS b
       |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
       |        FROM documents)),
       |stats AS (
       |  SELECT b,
       |    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
       |    CAST(count(*) AS BIGINT) AS cr
       |  FROM toks GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr
       |  FROM stats),
       |wt AS (
       |  SELECT b,
       |    (((ct + 1) * $RScale) // (cr + 1)) *
       |      (((tr + $B) * $RScale) // (tt + $B)) // $RScale AS w
       |  FROM stats CROSS JOIN tot),
       |scores AS (
       |  SELECT doc_id,
       |    CAST(sum(w) AS BIGINT) // count(*) AS score
       |  FROM toks JOIN wt USING (b) GROUP BY 1),
       |sbar AS (
       |  SELECT greatest(1, CAST(sum(score) AS BIGINT) // count(*)) AS sb
       |  FROM scores)
       |SELECT d.doc_id, d.lang, d.source, s.score
       |FROM documents d JOIN scores s USING (doc_id) CROSS JOIN sbar
       |WHERE ${Hashing.hash48Sql("(d.doc_id)::VARCHAR")} % $SampleBuckets <
       |  least($SampleBuckets, (s.score * $SampleBuckets) // (2 * sb))""".stripMargin
}
