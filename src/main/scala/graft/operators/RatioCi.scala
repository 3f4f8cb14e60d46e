package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Delta-method CI for a RATIO metric over clusters — the experiment
  * readout q96/q257 cannot give. A per-order metric (revenue per
  * order) under per-CUSTOMER randomization is a ratio of cluster sums
  * R = Σy_c / Σx_c, and the naive per-order t-test SE is wrong
  * because orders within a customer are correlated. The standard fix
  * (Deng et al. 2018's practitioner formulation; Fieller's
  * linearization) treats clusters as the iid units:
  *
  *   Var(R) ≈ (s²_y − 2R·s_yx + R²·s²_x) / (n·x̄²)
  *
  * with sample (co)variances over the n cluster pairs (y_c, x_c).
  *
  * Exactness: cluster sums are exact integers (cents and counts), so
  * ALL six sufficient statistics are exact DECIMAL(38,0) sums with no
  * flooring anywhere (Σy² passes 2^63 at sf0.1 — the q68 stance);
  * R, the variances, the SE and the ±1.96 CI ride ONE shared-text
  * double chain with a single round-4 family at display.
  *
  * Plan/scale: one corpus scan → per-cluster sums (map-side
  * combined) → one dimension-broadcast join → one keyed moment
  * aggregate → closed form. Two shuffles total, both key-bounded. */
object RatioCi {

  private val Nd = "CAST(n_units AS DOUBLE)"
  private val RSql = "(CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))"
  /** Sample (co)variance recoveries over exact sums. */
  private def sampVar(ss: String, s: String) =
    s"((CAST($ss AS DOUBLE) - CAST($s AS DOUBLE) * CAST($s AS DOUBLE) / $Nd) / ($Nd - 1.0))"
  private val SampCov =
    s"((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / $Nd) / ($Nd - 1.0))"
  private val XbarSql = s"(CAST(sx AS DOUBLE) / $Nd)"
  private val VarSql =
    s"((${sampVar("syy", "sy")} - 2.0 * r * $SampCov + r * r * ${sampVar("sxx", "sx")})" +
      s" / ($Nd * $XbarSql * $XbarSql))"

  /** Ratio CI per group from cluster rows (g, y, x): exact integer
    * numerator/denominator contributions per cluster. One row per
    * group: (g, n_units, ratio, se, ci_lo, ci_hi) — NULL inference
    * when n < 2 or Σx ≤ 0. `scale` divides the displayed ratio/SE/CI
    * (cents → dollars). */
  def ratioCi(clusters: DataFrame, scale: Double = 1.0): DataFrame =
    clusters
      .filter(col("y").isNotNull && col("x").isNotNull)
      .groupBy("g")
      .agg(
        count(lit(1)).as("n_units"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))")).as("syy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))")).as("sxy"))
      .selectExpr("g", "n_units", "sy", "sx", "syy", "sxx", "sxy",
        s"CASE WHEN n_units >= 2 AND sx > 0 THEN $RSql END AS r")
      .selectExpr("g", "n_units", "r",
        s"CASE WHEN r IS NOT NULL THEN sqrt($VarSql) END AS se_raw")
      .selectExpr("g", "n_units",
        s"round(r / $scale, 4) + 0.0 AS ratio",
        s"round(se_raw / $scale, 4) + 0.0 AS se",
        s"round((r - 1.96 * se_raw) / $scale, 4) + 0.0 AS ci_lo",
        s"round((r + 1.96 * se_raw) / $scale, 4) + 0.0 AS ci_hi")

  /** q285: revenue per order by market segment with the
    * customer-clustered delta-method CI — the number a segment-level
    * pricing experiment would actually report. */
  def segmentRevenuePerOrder(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull && col("o_totalprice").isNotNull)
      .groupBy("o_custkey")
      .agg(
        expr("CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT)")
          .as("y"),
        expr("CAST(count(1) AS BIGINT)").as("x"))
    ratioCi(perCust
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_mktsegment AS g", "y", "x"), scale = 100.0)
      .withColumnRenamed("g", "c_mktsegment")
  }

  val segmentRevenuePerOrderSql: String =
    s"""WITH per_cust AS (
       |  SELECT o_custkey,
       |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS y,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM orders
       |  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1),
       |clusters AS (
       |  SELECT c_mktsegment AS g, y, x
       |  FROM per_cust JOIN customer ON o_custkey = c_custkey),
       |sums AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_units,
       |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
       |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
       |    CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy,
       |    CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
       |    CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy
       |  FROM clusters GROUP BY 1),
       |ratio AS (
       |  SELECT g, n_units, sy, sx, syy, sxx, sxy,
       |    CASE WHEN n_units >= 2 AND sx > 0 THEN $RSql END AS r
       |  FROM sums),
       |se AS (
       |  SELECT g, n_units, r,
       |    CASE WHEN r IS NOT NULL THEN sqrt($VarSql) END AS se_raw
       |  FROM ratio)
       |SELECT g AS c_mktsegment, n_units,
       |  round(r / 100.0, 4) + 0.0 AS ratio,
       |  round(se_raw / 100.0, 4) + 0.0 AS se,
       |  round((r - 1.96 * se_raw) / 100.0, 4) + 0.0 AS ci_lo,
       |  round((r + 1.96 * se_raw) / 100.0, 4) + 0.0 AS ci_hi
       |FROM se""".stripMargin
}
