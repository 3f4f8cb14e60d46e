package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Unigram entropy per corpus slice — the lexical-diversity monitor
  * for training-data mixes: a source whose token entropy collapses is
  * template spam or a scraper loop (the corpus-level symptom q40's
  * per-document Gopher repetition can't see), and entropy is the
  * quantity DSIR-style importance weights (q67) implicitly compare.
  * Normalized by ln(vocab), 1.0 = uniform usage, → 0 = one token
  * dominating.
  *
  * Semantics: whitespace tokens (the corpus convention of
  * q28/q37/q79); per source: token count n, vocabulary size v,
  * Shannon entropy H = Σ (c/n)·ln(n/c) in nats, and H / ln(v)
  * (NULL for a single-token vocabulary via nullif).
  *
  * Exactness: q104's nano-nat discipline verbatim — every ln argument
  * is a ratio of exact integers snapped to the 1e-9 grid, each term
  * floors to integer nano-nats, only integers are summed (DECIMAL 38),
  * and the final scale-downs are shared text. The q104 precondition
  * (per-term micro-floor fits int64 through n ≈ 2.5e10) applies.
  *
  * Plan/scale: token explode → ONE map-side-combined (source, term)
  * cell aggregate (vocabulary-sized output, the q37 shape) → per-
  * source totals derived from the cells (no second corpus scan) →
  * broadcast join + one cell aggregate. No windows, no collects.
  */
object Entropy {

  private def lnSnap(ratio: String): String =
    s"CAST(floor(ln($ratio) * 1e9 + 5e-1) AS DOUBLE) / 1e9"

  /** Per-group token entropy of whitespace-tokenized `textCol`. */
  def tokenEntropy(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    // slice totals via a per-slice window over the vocabulary-sized
    // cell frame — NOT an aggregate + join back, which would duplicate
    // the corpus explode subtree (Spark does not CSE repeated frames)
    val cells = docs
      .select(col(groupCol).as("g"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("g", "term")
      .agg(expr("CAST(count(1) AS BIGINT)").as("c"))
      .withColumn("n", expr("CAST(sum(c) OVER (PARTITION BY g) AS BIGINT)"))
      .withColumn("v", expr("CAST(count(1) OVER (PARTITION BY g) AS BIGINT)"))
    val hTerm =
      s"CAST(floor(CAST(c AS DOUBLE) * (${lnSnap("CAST(n AS DOUBLE) / CAST(c AS DOUBLE)")}) * 1e9)" +
        " AS DECIMAL(38,0))"
    cells
      .groupBy("g")
      .agg(expr("CAST(max(n) AS BIGINT)").as("n_tokens"),
        expr("CAST(max(v) AS BIGINT)").as("vocab"),
        expr(s"CAST(sum($hTerm) AS DECIMAL(38,0))").as("s_h"))
      .selectExpr("g", "n_tokens", "vocab",
        "CAST(s_h AS DOUBLE) / nullif(CAST(n_tokens AS DOUBLE), 0e0) / 1e9" +
          " AS h_raw",
        s"""${lnSnap("CAST(vocab AS DOUBLE)")} AS lv""")
      .selectExpr("g", "n_tokens", "vocab",
        "round(h_raw, 6) + 0.0 AS entropy",
        "round(h_raw / nullif(lv, 0e0), 6) + 0.0 AS norm_entropy")
  }

  /** q129: lexical diversity per document source. */
  def sourceEntropy(spark: SparkSession, dir: String): DataFrame =
    tokenEntropy(Tables.documents(spark, dir), "source", "text")
      .withColumnRenamed("g", "source")

  val sourceEntropySql: String = {
    def lnSnapSql(ratio: String): String =
      s"CAST(floor(ln($ratio) * 1e9 + 5e-1) AS DOUBLE) / 1e9"
    val hTerm =
      s"CAST(floor(CAST(c AS DOUBLE) * (${lnSnapSql("CAST(n AS DOUBLE) / CAST(c AS DOUBLE)")}) * 1e9)" +
        " AS DECIMAL(38,0))"
    s"""WITH cells AS (
       |  SELECT source AS g, t.term, CAST(count(*) AS BIGINT) AS c
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE t.term <> '' GROUP BY 1, 2),
       |tot AS (
       |  SELECT g, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v
       |  FROM cells GROUP BY 1),
       |agg AS (
       |  SELECT cells.g, CAST(max(n) AS BIGINT) AS n_tokens,
       |    CAST(max(v) AS BIGINT) AS vocab,
       |    CAST(sum($hTerm) AS DECIMAL(38,0)) AS s_h
       |  FROM cells JOIN tot ON cells.g = tot.g GROUP BY 1),
       |raw AS (
       |  SELECT g, n_tokens, vocab,
       |    CAST(s_h AS DOUBLE) / nullif(CAST(n_tokens AS DOUBLE), 0e0) / 1e9
       |      AS h_raw,
       |    ${lnSnapSql("CAST(vocab AS DOUBLE)")} AS lv
       |  FROM agg)
       |SELECT g AS source, n_tokens, vocab,
       |  round(h_raw, 6) + 0.0 AS entropy,
       |  round(h_raw / nullif(lv, 0e0), 6) + 0.0 AS norm_entropy
       |FROM raw""".stripMargin
  }
}
