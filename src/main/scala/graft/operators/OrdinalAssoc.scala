package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Goodman–Kruskal gamma + Somers' D — the ordinal-association pair
  * that completes the concordance family: q68's τ-b penalizes ties
  * symmetrically (the correlation-matrix number), gamma IGNORES all
  * tied pairs (Goodman & Kruskal 1954 — the right readout when ties
  * are an artifact of coarse measurement), and Somers' D (1962) is
  * the ASYMMETRIC member — d_yx conditions on untied x only, making
  * it the "how much does the predictor order the outcome" number.
  * NAMING (conventions collide in the literature — pinned here and
  * spec-tested): somers_d_yx = S/(pairs untied on x) — y read as the
  * response, ties on the predictor uninformative (Wikipedia's d_YX);
  * somers_d_xy = S/(pairs untied on y) — for va = score and vb a
  * binary outcome this is R Hmisc::somers2's Dxy and equals
  * 2·AUC − 1, the Gini/discrimination identity q83 readers know
  * (spec-pinned). All three measures share one set of sufficient
  * statistics.
  *
  * EXACTNESS: S = C − D and CD = C + D come from the value-cell
  * self-join with decimal-first products (the q68 kendallStats
  * discipline); marginal tie sums ta2/tb2 = Σt(t−1) are exact
  * DECIMAL(38,0); each measure is ONE shared-text division of exact
  * integers with the /2s CLEARED — gamma = S/CD,
  * d_yx = 2S/(n(n−1) − ta2), d_xy = 2S/(n(n−1) − tb2) — and all-tied
  * denominators NULL via nullif, never divide-by-zero.
  *
  * Plan/scale: ONE map-side-combined cell aggregate over the fact,
  * then a broadcast cell-grid self-join bounded by value-pair
  * cardinality squared, never row count (quantize continuous columns
  * first — the q47/q68 precondition). */
object OrdinalAssoc {

  /** One-row gamma/Somers frame from rows (va, vb) — both ordinal,
    * any orderable type. Returns (n_rows, s_stat, gamma,
    * somers_d_yx, somers_d_xy). */
  def gammaSomers(rows: DataFrame): DataFrame = {
    val pc = rows
      .filter(col("va").isNotNull && col("vb").isNotNull)
      .groupBy("va", "vb")
      .agg(expr("CAST(count(1) AS BIGINT)").as("cnt"))
      .localCheckpoint(true) // join sides + margins read it
    val c1 = pc.select(col("va").as("va1"), col("vb").as("vb1"),
      col("cnt").as("n1"))
    val c2 = pc.select(col("va").as("va2"), col("vb").as("vb2"),
      col("cnt").as("n2"))
    val sAgg = c1.join(broadcast(c2), col("va1") < col("va2")).agg(
      expr("CAST(coalesce(sum(CAST(n1 AS DECIMAL(38,0)) * n2 *" +
        " (CASE WHEN vb2 > vb1 THEN 1 WHEN vb2 < vb1 THEN -1 ELSE 0 END))," +
        " 0) AS DECIMAL(38,0))").as("s_raw"),
      expr("CAST(coalesce(sum(CAST(n1 AS DECIMAL(38,0)) * n2 *" +
        " (CASE WHEN vb2 <> vb1 THEN 1 ELSE 0 END)), 0)" +
        " AS DECIMAL(38,0))").as("cd_raw"))
    def marg(vcol: String, out: String): DataFrame =
      pc.groupBy(col(vcol))
        .agg(expr("CAST(sum(cnt) AS BIGINT)").as("t"))
        .agg(expr("CAST(sum(t) AS BIGINT)").as(s"n_$out"),
          expr("CAST(sum(CAST(t AS DECIMAL(38,0)) * (t - 1))" +
            s" AS DECIMAL(38,0))").as(s"t2_$out"))
    sAgg
      .crossJoin(marg("va", "a"))
      .crossJoin(marg("vb", "b").drop("n_b"))
      .selectExpr("n_a AS n_rows",
        "CAST(s_raw AS DOUBLE) + 0.0 AS s_stat",
        "round(CAST(s_raw AS DOUBLE) /" +
          " nullif(CAST(cd_raw AS DOUBLE), 0e0), 6) + 0.0 AS gamma",
        "round(2e0 * CAST(s_raw AS DOUBLE) / nullif(CAST(" +
          "CAST(n_a AS DECIMAL(38,0)) * (n_a - 1) - t2_a AS DOUBLE)," +
          " 0e0), 6) + 0.0 AS somers_d_yx",
        "round(2e0 * CAST(s_raw AS DOUBLE) / nullif(CAST(" +
          "CAST(n_a AS DECIMAL(38,0)) * (n_a - 1) - t2_b AS DOUBLE)," +
          " 0e0), 6) + 0.0 AS somers_d_xy")
  }

  /** q248: does a deeper discount move larger line quantities,
    * ordinally? x = discount percent (11 levels), y = quantity
    * (50 levels) — 550 cells at ANY scale. */
  def discountQuantity(spark: SparkSession, dir: String): DataFrame =
    gammaSomers(Tables.lineitem(spark, dir)
      .selectExpr(
        "CAST(round(l_discount * 100, 0) AS BIGINT) AS va",
        "CAST(l_quantity AS BIGINT) AS vb"))

  /** DuckDB twin: identical cell program and cleared-integer
    * divisions. */
  val discountQuantitySql: String =
    """WITH cells AS (
      |  SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS va,
      |    CAST(l_quantity AS BIGINT) AS vb,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM lineitem
      |  WHERE l_discount IS NOT NULL AND l_quantity IS NOT NULL
      |  GROUP BY 1, 2),
      |s AS (
      |  SELECT
      |    CAST(coalesce(sum(CAST(a.cnt AS DECIMAL(38,0)) * b.cnt *
      |      (CASE WHEN b.vb > a.vb THEN 1 WHEN b.vb < a.vb THEN -1
      |       ELSE 0 END)), 0) AS DECIMAL(38,0)) AS s_raw,
      |    CAST(coalesce(sum(CAST(a.cnt AS DECIMAL(38,0)) * b.cnt *
      |      (CASE WHEN b.vb <> a.vb THEN 1 ELSE 0 END)), 0)
      |      AS DECIMAL(38,0)) AS cd_raw
      |  FROM cells a JOIN cells b ON a.va < b.va),
      |ma AS (
      |  SELECT CAST(sum(t) AS BIGINT) AS n_a,
      |    CAST(sum(CAST(t AS DECIMAL(38,0)) * (t - 1)) AS DECIMAL(38,0))
      |      AS t2_a
      |  FROM (SELECT va, CAST(sum(cnt) AS BIGINT) AS t
      |        FROM cells GROUP BY 1)),
      |mb AS (
      |  SELECT CAST(sum(CAST(t AS DECIMAL(38,0)) * (t - 1)) AS DECIMAL(38,0))
      |      AS t2_b
      |  FROM (SELECT vb, CAST(sum(cnt) AS BIGINT) AS t
      |        FROM cells GROUP BY 1))
      |SELECT n_a AS n_rows,
      |  CAST(s_raw AS DOUBLE) + 0.0 AS s_stat,
      |  round(CAST(s_raw AS DOUBLE) /
      |    nullif(CAST(cd_raw AS DOUBLE), 0e0), 6) + 0.0 AS gamma,
      |  round(2e0 * CAST(s_raw AS DOUBLE) / nullif(CAST(
      |    CAST(n_a AS DECIMAL(38,0)) * (n_a - 1) - t2_a AS DOUBLE),
      |    0e0), 6) + 0.0 AS somers_d_yx,
      |  round(2e0 * CAST(s_raw AS DOUBLE) / nullif(CAST(
      |    CAST(n_a AS DECIMAL(38,0)) * (n_a - 1) - t2_b AS DOUBLE),
      |    0e0), 6) + 0.0 AS somers_d_xy
      |FROM s CROSS JOIN ma CROSS JOIN mb""".stripMargin
}
