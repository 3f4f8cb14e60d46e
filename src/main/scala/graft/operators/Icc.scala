package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Intraclass correlation ICC(1) — the VARIANCE-COMPONENTS question
  * none of the correlation deck asks: q68's Pearson needs two paired
  * variables; ICC asks how much of ONE variable's variance lives
  * BETWEEN clusters vs within them — "is order size a property of the
  * customer or of the order?" — the number behind reliability
  * analysis, cluster-randomized design effects (DEFF = 1 + (k̄−1)·ICC)
  * and every "should we model per-customer effects" decision.
  * One-way random-effects ANOVA estimator (unbalanced, k₀ the
  * standard ANOVA-weighted mean cluster size):
  *
  *   ICC = (MSB − MSW) / (MSB + (k₀ − 1)·MSW)
  *   k₀ = (N − Σnᵢ²/N) / (g − 1)
  *
  * Exactness: the only rational term that must cross cluster rows —
  * tᵢ = sᵢ²/nᵢ — is a shared-text double snapped to the MICRO grid
  * per cluster and summed as an exact DECIMAL(38,0) (the q187 Theil
  * per-group-term move: never a raw double across rows). Everything
  * per GROUP (G²/N, Σnᵢ²/N, the MS chain) is one shared-text double
  * chain from exact integer sums. Documented bound: the micro snap
  * floors sᵢ²·10⁶ into a Long, so per-cluster sums must stay under
  * ~3e6 value units — pick the unit grid accordingly (the registered
  * query uses WHOLE DOLLARS, good to ~$3M lifetime per customer; at
  * larger scales coarsen the unit, the q170 gridDiv stance).
  *
  * Plan/scale: one map-side-combined aggregate to per-cluster sums
  * (the shuffle carries 4 numbers per cluster), one keyed finish per
  * group — no windows, no joins on fact rows. */
object Icc {

  private val SsbSql =
    "(CAST(st_micro AS DOUBLE) / 1e6 - CAST(gsum AS DOUBLE)" +
      " * CAST(gsum AS DOUBLE) / CAST(n_rows AS DOUBLE))"
  private val MsbSql = s"($SsbSql / (CAST(n_groups AS DOUBLE) - 1.0))"
  private val MswSql =
    "((CAST(q_all AS DOUBLE) - CAST(st_micro AS DOUBLE) / 1e6)" +
      " / (CAST(n_rows AS DOUBLE) - CAST(n_groups AS DOUBLE)))"
  private val K0Sql =
    "((CAST(n_rows AS DOUBLE) - CAST(sn2 AS DOUBLE)" +
      " / CAST(n_rows AS DOUBLE)) / (CAST(n_groups AS DOUBLE) - 1.0))"

  /** ICC(1) per group from a frame with (g, cl, x): group key, cluster
    * id, integer value. One row per group: (g, n_rows, n_groups, k0,
    * msb, msw, icc1) — NULL icc when the denominator collapses;
    * groups with one cluster or no within-replication are dropped. */
  def icc1(values: DataFrame): DataFrame =
    values
      .groupBy("g", "cl")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_i"),
        expr("CAST(sum(x) AS BIGINT)").as("s_i"),
        expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))")
          .as("q_i"))
      .groupBy("g")
      .agg(
        expr("CAST(sum(n_i) AS BIGINT)").as("n_rows"),
        expr("CAST(count(1) AS BIGINT)").as("n_groups"),
        expr("CAST(sum(s_i) AS BIGINT)").as("gsum"),
        expr("CAST(sum(q_i) AS DECIMAL(38,0))").as("q_all"),
        expr("CAST(sum(CAST(floor(CAST(s_i AS DOUBLE)" +
          " * CAST(s_i AS DOUBLE) / CAST(n_i AS DOUBLE) * 1e6 + 5e-1)" +
          " AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("st_micro"),
        expr("CAST(sum(n_i * n_i) AS BIGINT)").as("sn2"))
      .filter(col("n_groups") > 1 && col("n_rows") > col("n_groups"))
      .selectExpr("g", "n_rows", "n_groups",
        s"round($K0Sql, 6) + 0.0 AS k0",
        s"round($MsbSql, 6) + 0.0 AS msb",
        s"round($MswSql, 6) + 0.0 AS msw",
        s"round(($MsbSql - $MswSql) / nullif($MsbSql" +
          s" + ($K0Sql - 1.0) * $MswSql, 0.0), 6) + 0.0 AS icc1")

  /** q203: is order value a CUSTOMER property or an order property,
    * per segment — clusters = customers, values = whole-dollar order
    * totals (the documented unit bound); the design-effect number
    * behind any per-customer sampling or modeling choice. */
  def customerOrderIcc(spark: SparkSession, dir: String): DataFrame =
    icc1(Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull && col("o_totalprice").isNotNull)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_mktsegment AS g", "o_custkey AS cl",
        "CAST(floor(o_totalprice) AS BIGINT) AS x"))
      .withColumnRenamed("g", "c_mktsegment")

  /** DuckDB twin: identical cluster snaps and shared finish. */
  val customerOrderIccSql: String =
    s"""WITH base AS (
       |  SELECT c_mktsegment AS g, o_custkey AS cl,
       |    CAST(floor(o_totalprice) AS BIGINT) AS x
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL),
       |clusters AS (
       |  SELECT g, cl, CAST(count(*) AS BIGINT) AS n_i,
       |    CAST(sum(x) AS BIGINT) AS s_i,
       |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q_i
       |  FROM base GROUP BY 1, 2),
       |sums AS (
       |  SELECT g,
       |    CAST(sum(n_i) AS BIGINT) AS n_rows,
       |    CAST(count(*) AS BIGINT) AS n_groups,
       |    CAST(sum(s_i) AS BIGINT) AS gsum,
       |    CAST(sum(q_i) AS HUGEINT) AS q_all,
       |    CAST(sum(CAST(floor(CAST(s_i AS DOUBLE)
       |      * CAST(s_i AS DOUBLE) / CAST(n_i AS DOUBLE) * 1e6 + 5e-1)
       |      AS HUGEINT)) AS HUGEINT) AS st_micro,
       |    CAST(sum(n_i * n_i) AS BIGINT) AS sn2
       |  FROM clusters GROUP BY 1)
       |SELECT g AS c_mktsegment, n_rows, n_groups,
       |  round($K0Sql, 6) + 0.0 AS k0,
       |  round($MsbSql, 6) + 0.0 AS msb,
       |  round($MswSql, 6) + 0.0 AS msw,
       |  round(($MsbSql - $MswSql) / nullif($MsbSql
       |    + ($K0Sql - 1.0) * $MswSql, 0.0), 6) + 0.0 AS icc1
       |FROM sums
       |WHERE n_groups > 1 AND n_rows > n_groups""".stripMargin
}
