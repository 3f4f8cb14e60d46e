package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Good–Turing corpus-coverage estimate — the "how much vocabulary am
  * I still missing" readout that complements q137 Heaps (growth RATE)
  * and q131 Zipf (frequency SHAPE): the Good–Turing mass of unseen
  * types is P₀ = n₁/N (singleton tokens over total tokens — Good
  * 1953), and the Chao1 lower bound on total type richness is
  * V + n₁²/(2·n₂) (Chao 1984). Both drive the practical corpus-prep
  * question: will scraping more of this source yield new vocabulary,
  * or has it saturated? A source with high P₀ is under-sampled; one
  * with Chao1 ≈ V is mined out.
  *
  * Exactness: token cells are exact integer counts (the q131 space-
  * split convention — same cells, same empty-token filter, so the two
  * health metrics stay comparable); n₁/n₂/V/N are pure integer
  * aggregates of the cells; each reported estimate is ONE shared-text
  * double from those integers (Chao1 is NULL when n₂ = 0 — the
  * estimator is undefined, not infinite).
  *
  * Plan/scale: one scan → (source, term) cells (map-side combined —
  * vocabulary-grade, not corpus-grade) → one frequency-of-frequencies
  * aggregate per source. No windows, no joins.
  */
object GoodTuring {

  /** Per-group Good–Turing / Chao1 over (group, term) token cells. */
  def goodTuring(docs: DataFrame, groupCol: String, textCol: String): DataFrame =
    docs
      .select(col(groupCol).as("g"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("g"), col("term"))
      .agg(count(lit(1)).as("c"))
      .groupBy("g")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"))
      .selectExpr("g", "n_tokens", "vocab", "n1", "n2",
        "round(CAST(n1 AS DOUBLE) / n_tokens, 6) + 0.0 AS p_unseen",
        "CASE WHEN n2 = 0 THEN NULL ELSE" +
          " round(vocab + CAST(n1 AS DOUBLE) * n1 / (2.0 * n2), 2) + 0.0" +
          " END AS chao1")

  /** q154: coverage per document source. */
  def sourceGoodTuring(spark: SparkSession, dir: String): DataFrame =
    goodTuring(Tables.documents(spark, dir), "source", "text")
      .withColumnRenamed("g", "source")

  /** DuckDB twin: identical cells, aggregates, estimator text. */
  val sourceGoodTuringSql: String =
    s"""WITH cells AS (
       |  SELECT source AS g, t.term, CAST(count(*) AS BIGINT) AS c
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE t.term <> '' GROUP BY 1, 2),
       |ff AS (
       |  SELECT g, CAST(sum(c) AS BIGINT) AS n_tokens,
       |    CAST(count(*) AS BIGINT) AS vocab,
       |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
       |  FROM cells GROUP BY 1)
       |SELECT g AS source, n_tokens, vocab, n1, n2,
       |  round(CAST(n1 AS DOUBLE) / n_tokens, 6) + 0.0 AS p_unseen,
       |  CASE WHEN n2 = 0 THEN NULL ELSE
       |    round(vocab + CAST(n1 AS DOUBLE) * n1 / (2.0 * n2), 2) + 0.0
       |    END AS chao1
       |FROM ff""".stripMargin
}
