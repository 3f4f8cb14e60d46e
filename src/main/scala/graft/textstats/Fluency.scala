package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Bigram transition-probability fluency scoring — the n-gram LM
  * quality filter of CCNet/GPT-3-style pipelines (score text by how
  * predictable each next token is under a corpus LM; gibberish,
  * boilerplate soup, and mis-extracted markup score low). Re-expressed
  * in the engine's deterministic ratio form (no logs, no floats):
  *
  *   p̂(w₂|w₁)  ≈ ((c₁₂ + 1) · 1e6) div (c₁ + B)       add-1 smoothed
  *   fluency_d = (Σ_bigrams p̂) div n_bigrams_d          mean, in 1e-6
  *   label_d   = fluency_d > corpus mean
  *
  * Counts are HASHED-bucket counts (b = hash48(gram) % [[B]], the
  * q61/q67 feature-space recipe) so both count tables stay
  * dimension-grade and BROADCASTABLE at any corpus size; collisions
  * blur the LM slightly (documented trade — raise B for fidelity).
  * Docs with fewer than two tokens have no transitions and are out of
  * the filter's scope (no output row).
  *
  * Plan: bigrams are an ARRAY-level projection (`transform` over the
  * token array + one explode — no window, no shuffle for pairing);
  * fit = two map-side-combined bucket-count aggregates; apply = two
  * broadcast joins + one per-doc aggregate; per-doc scores are
  * localCheckpointed (doc-grade) and reused by the corpus mean and
  * the labeling pass — the q67 shape. Headroom: per-term ≤
  * (T·1e6) div B and per-doc sums stay under 2^63 for corpora to
  * ~1e12 bigrams; the corpus-mean sum is the first to need DECIMAL
  * past ~1e8 docs (swap keeps the plan).
  */
object Fluency {

  /** Hashed bucket space for both unigram-prefix and bigram counts. */
  val B = 4096L
  /** Fixed-point scale of the transition probability. */
  val PScale = 1000000L

  private def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ts) - 1), " +
          "i -> struct(ts[i-1] AS w1, concat(ts[i-1], ' ', ts[i]) AS w12))"))
        .as("p"))
      .select(col("doc_id"),
        (Hashing.hash48(col("p.w1")) % B).as("b1"),
        (Hashing.hash48(col("p.w12")) % B).as("b12"))

  /** q74: (doc_id, n_bigrams, fluency, label) over docs with ≥ 2
    * tokens. */
  def fluencyScore(docs: DataFrame): DataFrame = {
    // the bigram explode feeds the two count tables AND the scoring
    // join — persist it so the corpus tokenizes once across the three
    // consumers (no CSE across repeated frames); released as soon as
    // the doc-grade scores frame is materialized
    val bi = bigrams(docs).persist()
    val c1 = bi.groupBy("b1").agg(count(lit(1)).as("c1"))
    val c12 = bi.groupBy("b12").agg(count(lit(1)).as("c12"))
    val scores = bi
      .join(broadcast(c1), "b1")
      .join(broadcast(c12), "b12")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(expr(s"((c12 + 1) * $PScale) div (c1 + $B)")).as("ssum"))
      .selectExpr("doc_id", "n_bigrams", "ssum div n_bigrams AS fluency")
      .localCheckpoint(true) // doc-grade; reused by mean AND labeling
    bi.unpersist()
    val mu = scores.agg(
      greatest(lit(1L), expr("sum(fluency) div count(*)")).as("mu"))
    scores.crossJoin(broadcast(mu))
      .selectExpr("doc_id", "n_bigrams", "fluency",
        "CAST(fluency > mu AS INT) AS label")
  }

  def fluencyScore(spark: SparkSession, dir: String): DataFrame =
    fluencyScore(Tables.documents(spark, dir))

  /** DuckDB twin: identical hashed buckets and integer chains; lists
    * are 1-based where Spark arrays are 0-based, hence l[i]/l[i+1]
    * against ts[i-1]/ts[i] under the same i ∈ [1, len) range. */
  val fluencyScoreSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |bi AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(l)),
       |      i -> {'w1': l[i], 'w12': l[i] || ' ' || l[i + 1]})) AS p
       |  FROM toks WHERE len(l) >= 2),
       |bib AS (
       |  SELECT doc_id,
       |    ${Hashing.hash48Sql("p.w1")} % $B AS b1,
       |    ${Hashing.hash48Sql("p.w12")} % $B AS b12
       |  FROM bi),
       |c1 AS (SELECT b1, CAST(count(*) AS BIGINT) AS c1 FROM bib GROUP BY 1),
       |c12 AS (SELECT b12, CAST(count(*) AS BIGINT) AS c12 FROM bib GROUP BY 1),
       |sc AS (
       |  SELECT doc_id, count(*) AS n_bigrams,
       |    CAST(sum(((c12.c12 + 1) * $PScale) // (c1.c1 + $B)) AS BIGINT)
       |      // count(*) AS fluency
       |  FROM bib JOIN c1 USING (b1) JOIN c12 USING (b12)
       |  GROUP BY 1),
       |m AS (
       |  SELECT greatest(1, CAST(sum(fluency) AS BIGINT) // count(*)) AS mu
       |  FROM sc)
       |SELECT doc_id, n_bigrams, fluency,
       |  CAST(fluency > mu AS INT) AS label
       |FROM sc CROSS JOIN m""".stripMargin
}
