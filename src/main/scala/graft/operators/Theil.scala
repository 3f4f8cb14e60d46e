package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Theil T index with between/within decomposition — the inequality
  * measure the concentration deck was missing: q108's Gini and q112's
  * HHI report ONE number for one population; Theil is the member of
  * the family that DECOMPOSES exactly — T = T_between + T_within —
  * answering "is revenue concentration a geography story (between
  * nations) or a whale story (within each nation)?", the question a
  * mix report has to split before acting.
  *
  *   T        = Σᵢ (xᵢ/X)·ln(xᵢ/μ)
  *   T_between = Σ_g (X_g/X)·ln(μ_g/μ)
  *   T_within  = Σ_g (X_g/X)·T_g
  *
  * Exactness: the only transcendental is ln — snapped per ROW to the
  * 1e-9 nano-nat grid (the q110 discipline) so Σ x·⌊ln x⌉ accumulates
  * as an exact DECIMAL(38,0) (order-free); group means enter through
  * ln(X_g/N_g) on the same snap; the 25-ish per-group terms are each
  * snapped to a 1e-12 grid and summed as BIGINTs (a double sum over
  * groups would be partition-order-dependent). The reported total is
  * the SUM of the two snapped components — the decomposition identity
  * holds by construction, with each side ≤ 1e-12·k from its ideal.
  *
  * Plan/scale: one fact scan → keyed per-entity aggregate → keyed
  * per-group aggregate (dimension-grade) → broadcast totals → 1-row
  * finish. NO windows, no per-row second pass: the ln snap rides the
  * first aggregate's projection. */
object Theil {

  /** Theil decomposition from a frame with (g, x): group key and
    * positive BIGINT value per entity (x ≤ 0 rows are excluded and
    * counted). Returns one row: (n_entities, n_excluded, n_groups,
    * theil_between, theil_within, theil_total, between_share). */
  def theil(values: DataFrame): DataFrame = {
    val base = values.select("g", "x").localCheckpoint(true)
    val excluded = base.filter(col("x") <= 0 || col("x").isNull)
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_excluded"))
    val grp = base.filter(col("x") > 0)
      .withColumn("l", expr(
        "CAST(floor(ln(CAST(x AS DOUBLE)) * 1e9 + 5e-1) AS BIGINT)"))
      .groupBy("g")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_g"),
        expr("CAST(sum(x) AS BIGINT)").as("x_g"),
        expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * l) AS DECIMAL(38,0))")
          .as("sxl_g"))
    val totals = grp.agg(
      expr("CAST(count(1) AS BIGINT)").as("n_groups"),
      expr("CAST(sum(n_g) AS BIGINT)").as("n_entities"),
      expr("CAST(sum(x_g) AS BIGINT)").as("x_all"))
    grp.crossJoin(broadcast(totals))
      .selectExpr("n_groups", "n_entities", "x_all",
        s"CAST(floor($ShareSql * ($LnMuGSql - $LnMuSql) * 1e12 + 5e-1)" +
          " AS BIGINT) AS between_term",
        s"CAST(floor($ShareSql * $TgSql * 1e12 + 5e-1)" +
          " AS BIGINT) AS within_term")
      .groupBy("n_groups", "n_entities", "x_all")
      .agg(
        expr("CAST(sum(between_term) AS BIGINT)").as("b_sum"),
        expr("CAST(sum(within_term) AS BIGINT)").as("w_sum"))
      .crossJoin(broadcast(excluded))
      .selectExpr("n_entities", "n_excluded", "n_groups",
        "round(CAST(b_sum AS DOUBLE) / 1e12, 6) + 0.0 AS theil_between",
        "round(CAST(w_sum AS DOUBLE) / 1e12, 6) + 0.0 AS theil_within",
        "round(CAST(b_sum + w_sum AS DOUBLE) / 1e12, 6) + 0.0 AS theil_total",
        "round(CAST(b_sum AS DOUBLE)" +
          " / nullif(CAST(b_sum + w_sum AS DOUBLE), 0.0), 6) + 0.0" +
          " AS between_share")
  }

  // shared-text per-group chain (exact integer inputs; ln snapped)
  private val ShareSql =
    "(CAST(x_g AS DOUBLE) / CAST(x_all AS DOUBLE))"
  private val LnMuGSql =
    "(CAST(floor(ln(CAST(x_g AS DOUBLE) / CAST(n_g AS DOUBLE))" +
      " * 1e9 + 5e-1) AS BIGINT) / 1e9)"
  private val LnMuSql =
    "(CAST(floor(ln(CAST(x_all AS DOUBLE) / CAST(n_entities AS DOUBLE))" +
      " * 1e9 + 5e-1) AS BIGINT) / 1e9)"
  // T_g = (Σx·⌊ln x⌉ / 1e9) / X_g − ln(μ_g)
  private val TgSql =
    s"((CAST(sxl_g AS DOUBLE) / 1e9) / CAST(x_g AS DOUBLE) - $LnMuGSql)"

  /** q187: is customer-revenue concentration a geography story or a
    * whale story? Entities = customers (lifetime revenue cents),
    * groups = nations. */
  def nationRevenueTheil(spark: SparkSession, dir: String): DataFrame =
    theil(Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull && col("o_totalprice").isNotNull)
      .groupBy("o_custkey")
      .agg(expr("CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT))" +
        " AS BIGINT)").as("x"))
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_nationkey AS g", "x"))

  /** DuckDB twin: identical snaps, group terms, and integer sums. */
  val nationRevenueTheilSql: String =
    s"""WITH base AS (
       |  SELECT c_nationkey AS g, x
       |  FROM (
       |    SELECT o_custkey,
       |      CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS x
       |    FROM orders
       |    WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
       |    GROUP BY 1)
       |  JOIN customer ON o_custkey = c_custkey),
       |excluded AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_excluded
       |  FROM base WHERE x <= 0 OR x IS NULL),
       |grp AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_g,
       |    CAST(sum(x) AS BIGINT) AS x_g,
       |    CAST(sum(CAST(x AS HUGEINT)
       |      * CAST(floor(ln(CAST(x AS DOUBLE)) * 1e9 + 5e-1) AS BIGINT))
       |      AS HUGEINT) AS sxl_g
       |  FROM base WHERE x > 0 GROUP BY 1),
       |totals AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_groups,
       |    CAST(sum(n_g) AS BIGINT) AS n_entities,
       |    CAST(sum(x_g) AS BIGINT) AS x_all
       |  FROM grp),
       |terms AS (
       |  SELECT n_groups, n_entities, x_all,
       |    CAST(floor($ShareSql * ($LnMuGSql - $LnMuSql) * 1e12 + 5e-1)
       |      AS BIGINT) AS between_term,
       |    CAST(floor($ShareSql * $TgSql * 1e12 + 5e-1)
       |      AS BIGINT) AS within_term
       |  FROM grp CROSS JOIN totals),
       |summed AS (
       |  SELECT n_groups, n_entities, x_all,
       |    CAST(sum(between_term) AS BIGINT) AS b_sum,
       |    CAST(sum(within_term) AS BIGINT) AS w_sum
       |  FROM terms GROUP BY 1, 2, 3)
       |SELECT n_entities, n_excluded, n_groups,
       |  round(CAST(b_sum AS DOUBLE) / 1e12, 6) + 0.0 AS theil_between,
       |  round(CAST(w_sum AS DOUBLE) / 1e12, 6) + 0.0 AS theil_within,
       |  round(CAST(b_sum + w_sum AS DOUBLE) / 1e12, 6) + 0.0 AS theil_total,
       |  round(CAST(b_sum AS DOUBLE)
       |    / nullif(CAST(b_sum + w_sum AS DOUBLE), 0.0), 6) + 0.0
       |    AS between_share
       |FROM summed CROSS JOIN excluded""".stripMargin
}
