package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Pairwise Jensen–Shannon divergence matrix between corpus slices —
  * which sources SAY THE SAME THING: the redundancy map behind
  * mixing decisions (two near-identical sources should not both get
  * full weight in q60's DoReMi mix) and dedup triage (a pair at
  * JS ≈ 0 is a candidate for q46's incremental dedup between them).
  * The all-pairs extension of q103's two-sample JS, over unigram
  * distributions instead of value histograms.
  *
  * Semantics: per source, the unigram distribution p(t) = c(t)/n;
  * JS(i,j) = ½·Σ pᵢ·ln(2pᵢ/(pᵢ+pⱼ)) + ½·Σ pⱼ·ln(2pⱼ/(pᵢ+pⱼ)) in
  * nats ∈ [0, ln 2]; terms present in only one source contribute
  * exactly ln 2 per token of their mass, applied as ONE bulk
  * integer correction (nᵢ − Σ_shared cᵢ)·⌊ln 2·10⁹⌉ rather than a
  * per-term walk of the disjoint vocabulary (identical value, a
  * fraction of the rows).
  *
  * Exactness (q103's discipline): every ln ratio is cleared to exact
  * integers — 2·cᵢnⱼ/(cᵢnⱼ + cⱼnᵢ) — snapped to the 1e-9 grid,
  * per-term contributions floored to integer nano-nats, bulk ln 2
  * corrections pure integer products; only integers are summed, the
  * two final divides are shared text, and the 0-clamp is a CASE (the
  * q103 greatest()-ignores-NULL rule).
  *
  * Plan/scale: one corpus explode → (slice, term) cells
  * (checkpointed — totals AND both self-join sides read them), one
  * term-keyed self-join whose fan-out is ≤ C(G,2) pairs PER TERM
  * (slice count, not corpus size), one pair aggregate, then a
  * dimension-grade pair SPINE (totals × totals, g_i < g_j)
  * left-joined onto it so pairs sharing zero terms still emit their
  * js_div = ln 2 row. Never O(vocab²).
  */
object JsMatrix {

  /** ⌊ln 2 · 10⁹⌉ — the bulk per-token nano-nat mass of a one-sided
    * term (matches lnSnap's rounding of ln 2). */
  val Ln2Nano = 693147181L

  /** Pairwise JS matrix over whitespace-tokenized `textCol`. */
  def jsMatrix(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val cells = docs
      .select(col(groupCol).as("g"), explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("g", "term")
      .agg(expr("CAST(count(1) AS BIGINT)").as("c"))
      .localCheckpoint(true) // totals + both self-join sides
    val totals = cells.groupBy("g")
      .agg(expr("CAST(sum(c) AS BIGINT)").as("n"))
    def jsTerm(cSelf: String, tSelf: String, tOther: String): String = {
      val ratio = s"2e0 * CAST($tSelf AS DOUBLE)" +
        s" / (CAST($tSelf AS DOUBLE) + CAST($tOther AS DOUBLE))"
      val lnS = s"CAST(floor(ln($ratio) * 1e9 + 5e-1) AS DOUBLE) / 1e9"
      s"CAST(floor(CAST($cSelf AS DOUBLE) * ($lnS) * 1e9) AS DECIMAL(38,0))"
    }
    val paired = cells.selectExpr("g AS g_i", "term", "c AS c_i")
      .join(cells.selectExpr("g AS g_j", "term", "c AS c_j"), "term")
      .filter(col("g_i") < col("g_j"))
      .join(broadcast(totals.selectExpr("g AS g_i", "n AS n_i")), "g_i")
      .join(broadcast(totals.selectExpr("g AS g_j", "n AS n_j")), "g_j")
      .selectExpr("g_i", "g_j", "c_i", "c_j", "n_i", "n_j",
        "CAST(CAST(c_i AS DECIMAL(38,0)) * n_j AS DECIMAL(38,0)) AS t_i",
        "CAST(CAST(c_j AS DECIMAL(38,0)) * n_i AS DECIMAL(38,0)) AS t_j")
      .groupBy("g_i", "g_j")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("shared_terms"),
        expr("CAST(sum(c_i) AS BIGINT)").as("sh_ci"),
        expr("CAST(sum(c_j) AS BIGINT)").as("sh_cj"),
        expr(s"CAST(sum(${jsTerm("c_i", "t_i", "t_j")}) AS DECIMAL(38,0))")
          .as("s_i"),
        expr(s"CAST(sum(${jsTerm("c_j", "t_j", "t_i")}) AS DECIMAL(38,0))")
          .as("s_j"))
    // pair spine from the GROUP DIMENSION (totals × totals, g_i < g_j),
    // not from the shared-term join: a pair sharing ZERO terms has no
    // joined rows at all, but its JS is exactly ln 2 — the bulk
    // one-sided corrections cover both full masses (r9 advice). The
    // dimension-grade cross is a deliberate BNLJ over G rows.
    val spine = totals.selectExpr("g AS g_i", "n AS n_a")
      .crossJoin(broadcast(totals.selectExpr("g AS g_j", "n AS n_b")))
      .filter(col("g_i") < col("g_j"))
    spine.join(broadcast(paired), Seq("g_i", "g_j"), "left")
      .selectExpr("g_i", "g_j", "n_a", "n_b",
        "coalesce(shared_terms, CAST(0 AS BIGINT)) AS shared_terms",
        "coalesce(sh_ci, CAST(0 AS BIGINT)) AS sh_ci",
        "coalesce(sh_cj, CAST(0 AS BIGINT)) AS sh_cj",
        "coalesce(s_i, CAST(0 AS DECIMAL(38,0))) AS s_i",
        "coalesce(s_j, CAST(0 AS DECIMAL(38,0))) AS s_j")
      .selectExpr("g_i", "g_j", "n_a", "n_b", "shared_terms",
        s"CAST(s_i + CAST(n_a - sh_ci AS DECIMAL(38,0)) * $Ln2Nano" +
          " AS DECIMAL(38,0)) AS m_i",
        s"CAST(s_j + CAST(n_b - sh_cj AS DECIMAL(38,0)) * $Ln2Nano" +
          " AS DECIMAL(38,0)) AS m_j")
      .selectExpr("g_i", "g_j", "n_a", "n_b", "shared_terms",
        "CAST(m_i AS DOUBLE) / nullif(2e0 * CAST(n_a AS DOUBLE), 0e0)" +
          " + CAST(m_j AS DOUBLE) / nullif(2e0 * CAST(n_b AS DOUBLE), 0e0)" +
          " AS raw")
      .selectExpr("g_i", "g_j", "n_a", "n_b", "shared_terms",
        "round((CASE WHEN raw < 0e0 THEN 0e0 ELSE raw END) / 1e9, 6) + 0.0" +
          " AS js_div",
        "round((CASE WHEN raw < 0e0 THEN 0e0 ELSE raw END) / 1e9" +
          " / 0.6931471805599453, 6) + 0.0 AS js_norm")
  }

  /** q140: which document sources are interchangeable. */
  def sourceJsMatrix(spark: SparkSession, dir: String): DataFrame =
    jsMatrix(Tables.documents(spark, dir), "source", "text")
      .withColumnRenamed("g_i", "source_a")
      .withColumnRenamed("g_j", "source_b")

  val sourceJsMatrixSql: String = {
    def jsTerm(cSelf: String, tSelf: String, tOther: String): String = {
      val ratio = s"2e0 * CAST($tSelf AS DOUBLE)" +
        s" / (CAST($tSelf AS DOUBLE) + CAST($tOther AS DOUBLE))"
      val lnS = s"CAST(floor(ln($ratio) * 1e9 + 5e-1) AS DOUBLE) / 1e9"
      s"CAST(floor(CAST($cSelf AS DOUBLE) * ($lnS) * 1e9) AS HUGEINT)"
    }
    s"""WITH cells AS (
       |  SELECT source AS g, t.term, CAST(count(*) AS BIGINT) AS c
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE t.term <> '' GROUP BY 1, 2),
       |tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1),
       |paired AS (
       |  SELECT i.g AS g_i, j.g AS g_j, i.c AS c_i, j.c AS c_j,
       |    ti.n AS n_i, tj.n AS n_j,
       |    CAST(CAST(i.c AS HUGEINT) * tj.n AS HUGEINT) AS t_i,
       |    CAST(CAST(j.c AS HUGEINT) * ti.n AS HUGEINT) AS t_j
       |  FROM cells i
       |  JOIN cells j ON i.term = j.term AND i.g < j.g
       |  JOIN tot ti ON ti.g = i.g
       |  JOIN tot tj ON tj.g = j.g),
       |agg AS (
       |  SELECT g_i, g_j,
       |    CAST(count(*) AS BIGINT) AS shared_terms,
       |    CAST(sum(c_i) AS BIGINT) AS sh_ci,
       |    CAST(sum(c_j) AS BIGINT) AS sh_cj,
       |    CAST(sum(${jsTerm("c_i", "t_i", "t_j")}) AS HUGEINT) AS s_i,
       |    CAST(sum(${jsTerm("c_j", "t_j", "t_i")}) AS HUGEINT) AS s_j
       |  FROM paired GROUP BY 1, 2),
       |spine AS (
       |  SELECT i.g AS g_i, j.g AS g_j, i.n AS n_a, j.n AS n_b
       |  FROM tot i JOIN tot j ON i.g < j.g),
       |mass AS (
       |  SELECT spine.g_i, spine.g_j, n_a, n_b,
       |    CAST(coalesce(shared_terms, 0) AS BIGINT) AS shared_terms,
       |    CAST(coalesce(s_i, 0) + CAST(n_a - coalesce(sh_ci, 0) AS HUGEINT)
       |      * ${JsMatrix.Ln2Nano} AS HUGEINT) AS m_i,
       |    CAST(coalesce(s_j, 0) + CAST(n_b - coalesce(sh_cj, 0) AS HUGEINT)
       |      * ${JsMatrix.Ln2Nano} AS HUGEINT) AS m_j
       |  FROM spine LEFT JOIN agg
       |    ON spine.g_i = agg.g_i AND spine.g_j = agg.g_j),
       |raws AS (
       |  SELECT g_i, g_j, n_a, n_b, shared_terms,
       |    CAST(m_i AS DOUBLE) / nullif(2e0 * CAST(n_a AS DOUBLE), 0e0)
       |      + CAST(m_j AS DOUBLE) / nullif(2e0 * CAST(n_b AS DOUBLE), 0e0)
       |      AS raw
       |  FROM mass)
       |SELECT g_i AS source_a, g_j AS source_b, n_a, n_b, shared_terms,
       |  round((CASE WHEN raw < 0e0 THEN 0e0 ELSE raw END) / 1e9, 6) + 0.0
       |    AS js_div,
       |  round((CASE WHEN raw < 0e0 THEN 0e0 ELSE raw END) / 1e9
       |    / 0.6931471805599453, 6) + 0.0 AS js_norm
       |FROM raws""".stripMargin
  }
}
