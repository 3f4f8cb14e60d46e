package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Krippendorff's alpha (nominal) — the agreement coefficient that
  * completes the deck's reliability family: q136 Cohen handles
  * exactly two raters, q205 Fleiss demands a COMPLETE panel (its
  * completeness filter drops every unit that isn't rated exactly k
  * times); Krippendorff's α is the one used when the rating design is
  * RAGGED — any number of ratings per unit, missing data welcome —
  * which is what real annotation (and real line-item) data looks
  * like:
  *
  *   α = 1 − Do/De
  *   Do = (1/n)·Σ_u (n_u² − Σ_c n_uc²)/(n_u − 1)
  *   De = (n² − Σ_c n_c²)/(n·(n−1))
  *
  * over pairable units (n_u ≥ 2; singletons carry no pairs and are
  * excluded and counted — the canonical treatment).
  *
  * Exactness: every count is an exact BIGINT; the ONLY non-integer
  * step is the per-unit division by (n_u − 1), micro-floored per unit
  * and BIGINT-summed (the q91 move); α then collapses to ONE
  * shared-text chain — α = 1 − (Σ_u terms)·(n−1)/(10⁶·(n² − Σn_c²))
  * — on exactly-recovered doubles. All-one-value data (De = 0) →
  * NULL.
  *
  * Plan/scale: one corpus-touch (unit, value)-cell aggregate
  * (checkpointed — the unit tree and the value-total tree both read
  * it) → a per-unit aggregate + a per-value aggregate → two 1-row
  * reductions broadcast together. No windows. */
object Krippendorff {

  private val AlphaSql =
    "(1.0 - (CAST(do_i AS DOUBLE) * CAST(n_vals - 1 AS DOUBLE))" +
      " / (1e6 * CAST(de_num AS DOUBLE)))"

  /** α per group from (g, u, c): group, unit key, nominal value. One
    * row per group: (g, n_units, n_singletons, n_vals, alpha). */
  def alpha(ratings: DataFrame): DataFrame = {
    val cells = ratings.select("g", "u", "c")
      .groupBy("g", "u", "c")
      .agg(expr("CAST(count(1) AS BIGINT)").as("m"))
      .localCheckpoint(true) // unit terms + value totals both read it
    val units = cells.groupBy("g", "u")
      .agg(
        expr("CAST(sum(m) AS BIGINT)").as("nu"),
        expr("CAST(sum(m * m) AS BIGINT)").as("sq"))
    val unitAgg = units.groupBy("g").agg(
      expr("CAST(sum(CASE WHEN nu >= 2 THEN 1 ELSE 0 END) AS BIGINT)")
        .as("n_units"),
      expr("CAST(sum(CASE WHEN nu < 2 THEN 1 ELSE 0 END) AS BIGINT)")
        .as("n_singletons"),
      expr("CAST(sum(CASE WHEN nu >= 2 THEN nu END) AS BIGINT)").as("n_vals"),
      expr("CAST(sum(CASE WHEN nu >= 2 THEN" +
        " (1000000 * (nu * nu - sq)) div (nu - 1) END) AS BIGINT)")
        .as("do_i"))
    // value totals over PAIRABLE units only (the canonical De base)
    val valAgg = cells
      .join(units.filter(col("nu") >= 2).select("g", "u"), Seq("g", "u"),
        "left_semi")
      .groupBy("g", "c")
      .agg(expr("CAST(sum(m) AS BIGINT)").as("nc"))
      .groupBy("g")
      .agg(expr("CAST(sum(CAST(nc AS DECIMAL(38,0)) * nc) AS DECIMAL(38,0))")
        .as("snc2"))
    unitAgg.join(valAgg, Seq("g"), "left")
      .selectExpr("g", "n_units", "n_singletons", "n_vals", "do_i",
        "CAST(CAST(n_vals AS DECIMAL(38,0)) * n_vals - snc2" +
          " AS DECIMAL(38,0)) AS de_num")
      .selectExpr("g", "n_units", "n_singletons", "n_vals",
        "CASE WHEN n_vals >= 2 AND de_num > 0 THEN" +
          s" round($AlphaSql, 6) + 0.0 END AS alpha")
  }

  /** q227: how consistently do an order's line items share one return
    * flag, per priority — the RAGGED-panel agreement read (orders have
    * 1..7 lines; q205's Fleiss drops all but the modal panel size,
    * α keeps every pairable order — the comparison IS the point). */
  def orderFlagAlpha(spark: SparkSession, dir: String): DataFrame =
    alpha(
      Tables.lineitem(spark, dir)
        .filter(col("l_returnflag").isNotNull)
        .select("l_orderkey", "l_returnflag")
        .join(Tables.orders(spark, dir)
            .filter(col("o_orderpriority").isNotNull)
            .select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .selectExpr("o_orderpriority AS g", "l_orderkey AS u",
          "l_returnflag AS c"))
      .withColumnRenamed("g", "o_orderpriority")

  /** DuckDB twin: identical cells, per-unit micro floors, and chain. */
  val orderFlagAlphaSql: String =
    s"""WITH cells AS (
       |  SELECT o_orderpriority AS g, l_orderkey AS u, l_returnflag AS c,
       |    CAST(count(*) AS BIGINT) AS m
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_returnflag IS NOT NULL AND o_orderpriority IS NOT NULL
       |  GROUP BY 1, 2, 3),
       |units AS (
       |  SELECT g, u, CAST(sum(m) AS BIGINT) AS nu,
       |    CAST(sum(m * m) AS BIGINT) AS sq
       |  FROM cells GROUP BY 1, 2),
       |unit_agg AS (
       |  SELECT g,
       |    CAST(sum(CASE WHEN nu >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_units,
       |    CAST(sum(CASE WHEN nu < 2 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_singletons,
       |    CAST(sum(CASE WHEN nu >= 2 THEN nu END) AS BIGINT) AS n_vals,
       |    CAST(sum(CASE WHEN nu >= 2 THEN
       |      (1000000 * (nu * nu - sq)) // (nu - 1) END) AS BIGINT) AS do_i
       |  FROM units GROUP BY 1),
       |val_agg AS (
       |  SELECT g, CAST(sum(CAST(nc AS HUGEINT) * nc) AS HUGEINT) AS snc2
       |  FROM (
       |    SELECT c.g, c.c, CAST(sum(m) AS BIGINT) AS nc
       |    FROM cells c JOIN units uu ON c.g = uu.g AND c.u = uu.u
       |    WHERE uu.nu >= 2 GROUP BY 1, 2)
       |  GROUP BY 1),
       |rec AS (
       |  SELECT a.g, n_units, n_singletons, n_vals, do_i,
       |    CAST(CAST(n_vals AS HUGEINT) * n_vals - snc2 AS HUGEINT) AS de_num
       |  FROM unit_agg a LEFT JOIN val_agg v ON a.g = v.g)
       |SELECT g AS o_orderpriority, n_units, n_singletons, n_vals,
       |  CASE WHEN n_vals >= 2 AND de_num > 0 THEN
       |    round($AlphaSql, 6) + 0.0 END AS alpha
       |FROM rec""".stripMargin
}
