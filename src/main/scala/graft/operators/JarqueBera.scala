package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Jarque–Bera normality test — the moment-based screen the deck's
  * distribution tools presume but never check: q8's z-scores, q96's
  * t, q32's OLS inference all lean on approximate normality; JB asks
  * the question directly from skewness and excess kurtosis:
  *
  *   JB = n/6 · (g₁² + g₂²/4),   g₁ = m₃/m₂^{3/2},  g₂ = m₄/m₂² − 3
  *
  * JB ~ χ²₂ under H₀, whose survival is EXACTLY exp(−JB/2) — no
  * Wilson–Hilferty approximation needed (the one χ² with a closed
  * tail).
  *
  * Exactness: raw power sums of dollar-grid values overflow
  * DECIMAL(38,0) at the fourth power once n·x̄⁴-scale terms appear, so
  * the sums are PIVOT-CENTERED: pass 1 computes the integer pivot
  * c = ⌊Σx/n⌋ per group (BIGINT div — identical to DuckDB `//` for
  * positive operands); pass 2 sums exact d = x − c powers T₁..T₄ as
  * DECIMAL(38,0) (|d| is data-spread-sized, not mean-sized: d⁴ ≈ 1e23
  * on this schema → safe past 1e14 rows/group; the dollar grid is the
  * documented coarsening knob). The residual offset δ = T₁/n < 1/1
  * converts T's to exact central moments via ONE shared-text double
  * chain (binomial shift — purely rational, the q164 no-snap class);
  * m₂^{3/2} is m₂·sqrt(m₂) (sqrt is IEEE-correctly-rounded — pow would
  * need a snap); exp is 1e-9-snapped before display (q94 discipline).
  *
  * Plan/scale: two keyed aggregates over one checkpointed projection
  * (pass 1 pivots are dimension-grade and broadcast back); no windows,
  * no joins against facts. */
object JarqueBera {

  /** JB per group from a frame with (g, x): group key, exact BIGINT
    * value on a caller-chosen grid. Returns one row per group:
    * (g, n, skewness, kurtosis_excess, jb, p_value). */
  def jarqueBera(values: DataFrame): DataFrame = {
    val base = values.select("g", "x").localCheckpoint(true)
    val pivots = base.groupBy("g").agg(
      expr("CAST(count(1) AS BIGINT)").as("n"),
      expr("CAST(sum(x) AS BIGINT) div CAST(count(1) AS BIGINT)").as("c"))
    finishFromSums(base.join(broadcast(pivots), "g")
      .withColumn("d", expr("x - c"))
      .groupBy("g")
      .agg(
        expr("CAST(max(n) AS BIGINT)").as("n"),
        expr("CAST(sum(d) AS BIGINT)").as("t1"),
        expr("CAST(sum(CAST(d AS DECIMAL(38,0)) * d) AS DECIMAL(38,0))")
          .as("t2"),
        expr("CAST(sum(CAST(d AS DECIMAL(38,0)) * d * d) AS DECIMAL(38,0))")
          .as("t3"),
        expr("CAST(sum(CAST(d AS DECIMAL(38,0)) * d * d * d)" +
          " AS DECIMAL(38,0))").as("t4")))
  }

  /** The shared-text finish from a sums frame (g, n, t1..t4) centered
    * at the canonical pivot c = ⌊Σx/n⌋ — used by the batch operator
    * AND the 18z streaming twin (which re-centers its fixed-pivot
    * state to the same canonical pivot first, so the two walk an
    * IDENTICAL IEEE chain). */
  def finishFromSums(sums: DataFrame): DataFrame = {
    sums
      .selectExpr("g", "n", "t1", "t2", "t3", "t4",
        s"$DeltaSql AS delta", s"$NdSql AS nd")
      .selectExpr("g", "n", "delta", "nd",
        s"$M2Sql AS m2", s"$M3Sql AS m3", s"$M4Sql AS m4")
      .selectExpr("g", "n", "nd",
        s"$SkewSql AS skew_raw", s"$KurtSql AS kurt_raw")
      .selectExpr("g", "n", "nd", "skew_raw", "kurt_raw",
        s"$JbSql AS jb_raw")
      .selectExpr("g", "n",
        "round(skew_raw, 6) + 0.0 AS skewness",
        "round(kurt_raw, 6) + 0.0 AS kurtosis_excess",
        "round(jb_raw, 4) + 0.0 AS jb",
        s"round($PSql, 6) + 0.0 AS p_value")
      .orderBy("g")
  }

  // shared-text chain — each step references only prior columns, so
  // both engines walk the identical IEEE sequence from exact integers
  private val NdSql = "CAST(n AS DOUBLE)"
  private val DeltaSql = s"(CAST(t1 AS DOUBLE) / CAST(n AS DOUBLE))"
  private val M2Sql =
    "((CAST(t2 AS DOUBLE) - delta * CAST(t1 AS DOUBLE)) / nd)"
  private val M3Sql =
    "((CAST(t3 AS DOUBLE) - 3.0 * delta * CAST(t2 AS DOUBLE)" +
      " + 2.0 * nd * delta * delta * delta) / nd)"
  private val M4Sql =
    "((CAST(t4 AS DOUBLE) - 4.0 * delta * CAST(t3 AS DOUBLE)" +
      " + 6.0 * delta * delta * CAST(t2 AS DOUBLE)" +
      " - 3.0 * nd * delta * delta * delta * delta) / nd)"
  private val SkewSql =
    "(CASE WHEN n < 4 THEN NULL" +
      " ELSE m3 / nullif(m2 * sqrt(m2), 0.0) END)"
  private val KurtSql =
    "(CASE WHEN n < 4 THEN NULL" +
      " ELSE m4 / nullif(m2 * m2, 0.0) - 3.0 END)"
  private val JbSql =
    "(nd / 6.0 * (skew_raw * skew_raw + kurt_raw * kurt_raw / 4.0))"
  private val PSql =
    "(CAST(floor(exp(-(jb_raw / 2.0)) * 1e9 + 5e-1) AS DOUBLE) / 1e9)"

  /** q180: are order totals normal within each market segment? (No —
    * and JB quantifies by how much, per segment.) Values on the
    * whole-dollar grid. */
  def segmentPriceJb(spark: SparkSession, dir: String): DataFrame =
    jarqueBera(Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull && col("o_totalprice").isNotNull)
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_mktsegment AS g",
        "CAST(floor(o_totalprice) AS BIGINT) AS x"))
      .withColumnRenamed("g", "c_mktsegment")

  /** DuckDB twin: identical pivots, centered sums, and double chain. */
  val segmentPriceJbSql: String =
    s"""WITH base AS (
       |  SELECT c_mktsegment AS g, CAST(floor(o_totalprice) AS BIGINT) AS x
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL),
       |pivots AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS c
       |  FROM base GROUP BY 1),
       |sums AS (
       |  SELECT base.g, CAST(max(n) AS BIGINT) AS n,
       |    CAST(sum(x - c) AS BIGINT) AS t1,
       |    CAST(sum(CAST(x - c AS HUGEINT) * (x - c)) AS HUGEINT) AS t2,
       |    CAST(sum(CAST(x - c AS HUGEINT) * (x - c) * (x - c)) AS HUGEINT) AS t3,
       |    CAST(sum(CAST(x - c AS HUGEINT) * (x - c) * (x - c) * (x - c)) AS HUGEINT) AS t4
       |  FROM base JOIN pivots ON base.g = pivots.g GROUP BY 1),
       |deltas AS (
       |  SELECT g, n, t1, t2, t3, t4,
       |    $DeltaSql AS delta, $NdSql AS nd
       |  FROM sums),
       |moments AS (
       |  SELECT g, n, delta, nd,
       |    $M2Sql AS m2, $M3Sql AS m3, $M4Sql AS m4
       |  FROM deltas),
       |shapes AS (
       |  SELECT g, n, nd, $SkewSql AS skew_raw, $KurtSql AS kurt_raw
       |  FROM moments),
       |jbrow AS (
       |  SELECT g, n, nd, skew_raw, kurt_raw, $JbSql AS jb_raw
       |  FROM shapes)
       |SELECT g AS c_mktsegment, n,
       |  round(skew_raw, 6) + 0.0 AS skewness,
       |  round(kurt_raw, 6) + 0.0 AS kurtosis_excess,
       |  round(jb_raw, 4) + 0.0 AS jb,
       |  round($PSql, 6) + 0.0 AS p_value
       |FROM jbrow
       |ORDER BY c_mktsegment""".stripMargin
}
