package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Model-based quality scoring — the fastText-style linear classifier
  * every large pretraining corpus is filtered through (CCNet /
  * GPT-3-style "looks like reference text" filters: hash each token
  * into a bounded feature space, sum per-feature weights, threshold
  * the score). The trained weights are an input in production; here
  * they are DERIVED deterministically from the feature id
  * ([[Hashing.derivedConst]] recipe) so the operator carries an exact
  * DuckDB oracle — swap [[weightOf]] for a broadcast weight table and
  * the plan shape is unchanged.
  *
  * Everything is integer until the final division: feature bucket =
  * hash48(token) % [[Buckets]], weight = hash48-derived int in
  * [-500, 500], score = Σ weights (exact BIGINT on both engines —
  * order-independent, so partitioning cannot change it). The mean is
  * one LONG/LONG → double division + round(4), the established
  * cross-engine-stable step. No float accumulates anywhere.
  *
  * Plan: ONE scan, one token explode, one map-side-combined aggregate
  * keyed by doc_id — the same shape as q28 token counting; weights are
  * computed in the projection (no join). At 100 TB this is the cheap
  * kind of pass: no shuffle wider than (doc_id, partial sums).
  */
object QualityModel {

  /** Hashed feature-space size. Real fastText uses 2M+ buckets; 4096
    * keeps the oracle SQL cheap while exercising real collisions. */
  val Buckets = 4096L

  /** Score threshold: positive-sum documents pass the filter. */
  val FeatureSeed = "qw"

  /** Per-bucket weight in [-500, 500], derived from the bucket id. */
  private def weightOf(bucket: org.apache.spark.sql.Column) =
    Hashing.hash48(concat(lit(s"$FeatureSeed:"), bucket.cast("string"))) % 1001L - 500L

  private def weightOfSql(bucket: String) =
    s"${Hashing.hash48Sql(s"'$FeatureSeed:' || ($bucket)::VARCHAR")} % 1001 - 500"

  /** q61: (doc_id, n_tok, score_sum, mean_w, label) — label 1 iff the
    * summed feature weight is positive. */
  def qualityScore(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("w", weightOf(Hashing.hash48(col("tok")) % Buckets))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum("w").as("score_sum"))
      .select(col("doc_id"), col("n_tok"), col("score_sum"),
        round(col("score_sum").cast("double") / col("n_tok"), 4).as("mean_w"),
        (col("score_sum") > 0).cast("int").as("label"))

  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    qualityScore(Tables.documents(spark, dir))

  val qualityScoreSql: String = {
    val bucket = s"${Hashing.hash48Sql("tok")} % $Buckets"
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |scored AS (
       |  SELECT doc_id, ${weightOfSql(bucket)} AS w FROM toks)
       |SELECT doc_id, count(*) AS n_tok, CAST(sum(w) AS BIGINT) AS score_sum,
       |  round(CAST(sum(w) AS BIGINT) / count(*), 4) AS mean_w,
       |  CAST(CAST(sum(w) AS BIGINT) > 0 AS INT) AS label
       |FROM scored GROUP BY doc_id""".stripMargin
  }
}
