package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PMI collocations — which term PAIRS travel together across
  * documents far more than their individual frequencies predict: the
  * phrase-discovery / taxonomy-seed primitive ("new york", "machine
  * learning") that per-term statistics (q37 TF-IDF, q121 keyness)
  * cannot produce, and the pairwise instance of q104's mutual
  * information (one (a,b) cell instead of the full table).
  *
  * Semantics: document-level co-occurrence (a pair counts once per
  * doc containing both — presence, not proximity); the candidate
  * vocabulary is the top `topTerms` terms by document frequency
  * (ties by term), pairs need `minPairs` co-docs; PMI =
  * ln(n_ab·D / (n_a·n_b)) in nats, NPMI = PMI / ln(D/n_ab) ∈ (…,1].
  * Top `k` pairs ranked on the EXACT integer nano-nat PMI (the q121
  * rank rule — never rank on a rounded double), ties by pair.
  *
  * Exactness: q104's ln discipline — integer-count DECIMAL products
  * inside one snapped ln; NPMI is a ratio of two snapped lns, rounded
  * at 6.
  *
  * Plan/scale: the posting list is FILTERED to the top-terms
  * vocabulary before the self-join, so per-doc fan-out is ≤
  * C(topTerms, 2) — a hard bound chosen by the caller, never O(doc
  * length²); the vocabulary frame is dimension-grade and broadcast
  * everywhere (the q22 prefix-filter philosophy applied to
  * co-occurrence). One distinct + two map-side-combined aggregates +
  * one bounded equi-join on doc_id.
  */
object Pmi {

  private def lnSnap(ratio: String): String =
    s"CAST(floor(ln($ratio) * 1e9 + 5e-1) AS DOUBLE) / 1e9"

  /** Top-k PMI collocations over whitespace-tokenized `textCol`. */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
                   topTerms: Int = 100, minPairs: Int = 5,
                   k: Int = 50): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc"), explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .distinct()
    val d = toks.agg(expr("CAST(count(DISTINCT doc) AS BIGINT)").as("d"))
    val top = toks.groupBy("term")
      .agg(expr("CAST(count(1) AS BIGINT)").as("df"))
      .orderBy(col("df").desc, col("term"))
      .limit(topTerms)
    // top-filtered posting list is ≤ topTerms rows per doc — compact
    // enough to localCheckpoint, so the corpus explode+distinct is not
    // recomputed for each side of the pair self-join (Spark does not
    // CSE repeated frames)
    val posting = toks.join(broadcast(top), "term").localCheckpoint(true)
    val pairs = posting.as("a")
      .join(posting.as("b"),
        col("a.doc") === col("b.doc") && col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"))
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_ab"))
      .filter(col("n_ab") >= minPairs)
    val withDf = pairs
      .join(broadcast(top.select(col("term").as("term_a"), col("df").as("n_a"))),
        "term_a")
      .join(broadcast(top.select(col("term").as("term_b"), col("df").as("n_b"))),
        "term_b")
      .crossJoin(broadcast(d))
    withDf
      .withColumn("pmi_nano",
        expr(s"CAST(floor((${lnSnap(
          "CAST(CAST(n_ab AS DECIMAL(38,0)) * d AS DOUBLE)" +
            " / CAST(CAST(n_a AS DECIMAL(38,0)) * n_b AS DOUBLE)")}) * 1e9)" +
          " AS BIGINT)"))
      .withColumn("rk", expr(
        "row_number() OVER (ORDER BY pmi_nano DESC, term_a, term_b)"))
      .filter(col("rk") <= k)
      .selectExpr("rk", "term_a", "term_b", "n_ab", "n_a", "n_b",
        "round(CAST(pmi_nano AS DOUBLE) / 1e9, 6) + 0.0 AS pmi",
        s"""round(CAST(pmi_nano AS DOUBLE) / 1e9
           | / nullif(${lnSnap("CAST(d AS DOUBLE) / CAST(n_ab AS DOUBLE)")}, 0e0),
           | 6) + 0.0 AS npmi""".stripMargin)
  }

  /** q125: strongest term collocations in the corpus. */
  def docCollocations(spark: SparkSession, dir: String): DataFrame =
    collocations(Tables.documents(spark, dir), "doc_id", "text")

  val docCollocationsSql: String = {
    def lnSnapSql(ratio: String): String =
      s"CAST(floor(ln($ratio) * 1e9 + 5e-1) AS DOUBLE) / 1e9"
    s"""WITH toks AS (
       |  SELECT DISTINCT doc_id AS doc, t.term
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE t.term <> ''),
       |dd AS (SELECT CAST(count(DISTINCT doc) AS BIGINT) AS d FROM toks),
       |top AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df
       |  FROM toks GROUP BY 1 ORDER BY df DESC, term LIMIT 100),
       |posting AS (SELECT toks.doc, toks.term FROM toks JOIN top USING (term)),
       |pairs AS (
       |  SELECT a.term AS term_a, b.term AS term_b,
       |    CAST(count(*) AS BIGINT) AS n_ab
       |  FROM posting a JOIN posting b
       |    ON a.doc = b.doc AND a.term < b.term
       |  GROUP BY 1, 2 HAVING count(*) >= 5),
       |scored AS (
       |  SELECT term_a, term_b, n_ab, ta.df AS n_a, tb.df AS n_b, d,
       |    CAST(floor((${lnSnapSql(
      "CAST(CAST(n_ab AS HUGEINT) * d AS DOUBLE)" +
        " / CAST(CAST(ta.df AS HUGEINT) * tb.df AS DOUBLE)")}) * 1e9)
       |      AS BIGINT) AS pmi_nano
       |  FROM pairs
       |  JOIN top ta ON pairs.term_a = ta.term
       |  JOIN top tb ON pairs.term_b = tb.term
       |  CROSS JOIN dd),
       |ranked AS (
       |  SELECT *, row_number() OVER (ORDER BY pmi_nano DESC, term_a, term_b)
       |    AS rk
       |  FROM scored)
       |SELECT rk, term_a, term_b, n_ab, n_a, n_b,
       |  round(CAST(pmi_nano AS DOUBLE) / 1e9, 6) + 0.0 AS pmi,
       |  round(CAST(pmi_nano AS DOUBLE) / 1e9
       |    / nullif(${lnSnapSql("CAST(d AS DOUBLE) / CAST(n_ab AS DOUBLE)")}, 0e0),
       |    6) + 0.0 AS npmi
       |FROM ranked WHERE rk <= 50""".stripMargin
  }
}
