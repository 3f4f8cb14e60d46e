package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Heaps'-law vocabulary growth per corpus slice — V(n) ≈ K·n^β, the
  * companion diagnostic to q131's Zipf slope: natural text grows
  * vocabulary at β ≈ 0.4–0.6 forever; template spam PLATEAUS (low β)
  * and random noise climbs at β → 1. The "will more data keep adding
  * new information" curve behind every scaling-law data audit, and
  * the growth-side view of what q129's entropy measures statically.
  *
  * Semantics: docs in doc-id order per slice; at each doc, N = tokens
  * so far, V = distinct terms so far; OLS of ln V on ln N over the
  * per-doc checkpoints gives β (slope) and ln K (intercept), with r²;
  * slices with < 3 checkpoints → NULL r² (q131 rule).
  *
  * Exactness: V without any cumulative-distinct machinery — a term's
  * first-occurrence doc is a per-(slice, term) windowed min over the
  * cell frame, so "new terms in this doc" is an exact integer count
  * and V its running sum; the OLS is q131's integer-nano discipline
  * verbatim (snapped lns → INTEGER nanos → DECIMAL(38) sufficient
  * statistics → shared-text divides).
  *
  * Plan/scale: ONE corpus explode → one (slice, doc, term) cell
  * aggregate → first-occurrence window (partition (slice, term)) →
  * per-doc aggregate → BANDED cumulative sums (BandedCumsum: the
  * per-doc frame is corpus-cardinality, so the running (N, V) pair is
  * a distributed prefix sum over doc-id bands — every window task
  * bounded by `bandWidth` docs, never one task per slice; the r9
  * verdict's q137 fix) → final aggregate. The corpus is scanned once
  * (the round-9 no-duplicate-subtree rule); the one frame read twice
  * (per-doc checkpoints, for band offsets + the banded window) is
  * checkpointed inside BandedCumsum.
  */
object Heaps {

  /** Doc-id band width for the cumulative (N, V) prefix sums — the
    * BandedCumsum parallelism bound: ≤65k docs per window task. */
  val DocBandWidth: Long = graft.operators.BandedCumsum.DefaultBandWidth

  private def lnSnap(ratio: String): String =
    s"CAST(floor(ln($ratio) * 1e9 + 5e-1) AS DOUBLE) / 1e9"

  /** Per-group Heaps fit over whitespace-tokenized `textCol`. `idCol`
    * must be integral (it is the banded prefix-sum order key). */
  def heapsFit(docs: DataFrame, groupCol: String, idCol: String,
               textCol: String, bandWidth: Long = DocBandWidth): DataFrame = {
    val checkpoints = docs
      .select(col(groupCol).as("g"), col(idCol).as("doc"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("g", "doc", "term")
      .agg(expr("CAST(count(1) AS BIGINT)").as("c"))
      .withColumn("firstd", expr("min(doc) OVER (PARTITION BY g, term)"))
      .groupBy("g", "doc")
      .agg(expr("CAST(sum(c) AS BIGINT)").as("n_toks"),
        expr("CAST(sum(CASE WHEN doc = firstd THEN 1 ELSE 0 END) AS BIGINT)")
          .as("n_new"))
    val perDoc = graft.operators.BandedCumsum
      .cumsum(checkpoints, Seq("g"), "doc", Seq("n_toks", "n_new"), bandWidth)
      .selectExpr("g", "CAST(cum_n_toks AS BIGINT) AS nn",
        "CAST(cum_n_new AS BIGINT) AS vv")
      .selectExpr("g",
        s"CAST(floor((${lnSnap("CAST(nn AS DOUBLE)")}) * 1e9) AS BIGINT) AS xn",
        s"CAST(floor((${lnSnap("CAST(vv AS DOUBLE)")}) * 1e9) AS BIGINT) AS yn")
    perDoc.groupBy("g")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_docs"),
        expr("CAST(sum(CAST(xn AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("sx"),
        expr("CAST(sum(CAST(yn AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("sy"),
        expr("CAST(sum(CAST(xn AS DECIMAL(38,0)) * yn) AS DECIMAL(38,0))")
          .as("sxy"),
        expr("CAST(sum(CAST(xn AS DECIMAL(38,0)) * xn) AS DECIMAL(38,0))")
          .as("sxx"),
        expr("CAST(sum(CAST(yn AS DECIMAL(38,0)) * yn) AS DECIMAL(38,0))")
          .as("syy"))
      .selectExpr("g", "n_docs",
        "CAST(n_docs AS DOUBLE) AS nd",
        "CAST(sx AS DOUBLE) / 1e9 AS sxd", "CAST(sy AS DOUBLE) / 1e9 AS syd",
        "CAST(sxy AS DOUBLE) / 1e18 AS sxyd",
        "CAST(sxx AS DOUBLE) / 1e18 AS sxxd",
        "CAST(syy AS DOUBLE) / 1e18 AS syyd")
      .selectExpr("g", "n_docs",
        "round((nd * sxyd - sxd * syd)" +
          " / nullif(nd * sxxd - sxd * sxd, 0e0), 6) + 0.0 AS beta",
        "round((syd - sxd * ((nd * sxyd - sxd * syd)" +
          " / nullif(nd * sxxd - sxd * sxd, 0e0))) / nd, 6) + 0.0 AS ln_k",
        "round(CASE WHEN n_docs >= 3 THEN" +
          " ((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd))" +
          " / nullif((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd), 0e0)" +
          " END, 6) + 0.0 AS r2")
  }

  /** q137: vocabulary-growth exponent per document source. */
  def sourceHeaps(spark: SparkSession, dir: String): DataFrame =
    heapsFit(Tables.documents(spark, dir), "source", "doc_id", "text")
      .withColumnRenamed("g", "source")

  val sourceHeapsSql: String = {
    def lnSnapSql(ratio: String): String =
      s"CAST(floor(ln($ratio) * 1e9 + 5e-1) AS DOUBLE) / 1e9"
    s"""WITH cells AS (
       |  SELECT source AS g, doc_id AS doc, t.term, CAST(count(*) AS BIGINT)
       |    AS c
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE t.term <> '' GROUP BY 1, 2, 3),
       |flagged AS (
       |  SELECT g, doc, c,
       |    CASE WHEN doc = min(doc) OVER (PARTITION BY g, term)
       |      THEN 1 ELSE 0 END AS isnew
       |  FROM cells),
       |per_doc AS (
       |  SELECT g, doc, CAST(sum(c) AS BIGINT) AS n_toks,
       |    CAST(sum(isnew) AS BIGINT) AS n_new
       |  FROM flagged GROUP BY 1, 2),
       |cum AS (
       |  SELECT g,
       |    CAST(sum(n_toks) OVER (PARTITION BY g ORDER BY doc
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS nn,
       |    CAST(sum(n_new) OVER (PARTITION BY g ORDER BY doc
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS vv
       |  FROM per_doc),
       |pts AS (
       |  SELECT g,
       |    CAST(floor((${lnSnapSql("CAST(nn AS DOUBLE)")}) * 1e9) AS BIGINT)
       |      AS xn,
       |    CAST(floor((${lnSnapSql("CAST(vv AS DOUBLE)")}) * 1e9) AS BIGINT)
       |      AS yn
       |  FROM cum),
       |sums AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CAST(xn AS HUGEINT)) AS HUGEINT) AS sx,
       |    CAST(sum(CAST(yn AS HUGEINT)) AS HUGEINT) AS sy,
       |    CAST(sum(CAST(xn AS HUGEINT) * yn) AS HUGEINT) AS sxy,
       |    CAST(sum(CAST(xn AS HUGEINT) * xn) AS HUGEINT) AS sxx,
       |    CAST(sum(CAST(yn AS HUGEINT) * yn) AS HUGEINT) AS syy
       |  FROM pts GROUP BY 1),
       |d AS (
       |  SELECT g, n_docs, CAST(n_docs AS DOUBLE) AS nd,
       |    CAST(sx AS DOUBLE) / 1e9 AS sxd, CAST(sy AS DOUBLE) / 1e9 AS syd,
       |    CAST(sxy AS DOUBLE) / 1e18 AS sxyd,
       |    CAST(sxx AS DOUBLE) / 1e18 AS sxxd,
       |    CAST(syy AS DOUBLE) / 1e18 AS syyd
       |  FROM sums)
       |SELECT g AS source, n_docs,
       |  round((nd * sxyd - sxd * syd)
       |    / nullif(nd * sxxd - sxd * sxd, 0e0), 6) + 0.0 AS beta,
       |  round((syd - sxd * ((nd * sxyd - sxd * syd)
       |    / nullif(nd * sxxd - sxd * sxd, 0e0))) / nd, 6) + 0.0 AS ln_k,
       |  round(CASE WHEN n_docs >= 3 THEN
       |    ((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd))
       |    / nullif((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd), 0e0)
       |    END, 6) + 0.0 AS r2
       |FROM d""".stripMargin
  }
}
