package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cronbach's alpha — internal-consistency reliability of a k-item
  * battery: do the k parallel measurements of each case move TOGETHER
  * (one latent signal) or independently (k unrelated signals)? The
  * panel-health companion of q68's correlation matrix: alpha collapses
  * the whole matrix into the one number a pipeline can gate on, and
  * the item-dropped column answers "which item is hurting the scale?"
  * — the classical item-analysis table:
  *
  *   α = k/(k−1) · (1 − Σ var_j / var_total)
  *   α₋ⱼ over the k−1 remaining items; r_j = corr(x_j, total − x_j)
  *
  * Exactness: with x on the cent grid, every variance/covariance
  * NUMERATOR is denominator-free — M_j = n·Q_j − S_j², C_j = n·P_j −
  * S_j·S_tot, M_drop = M_tot + M_j − 2C_j — all exact DECIMAL(38,0)
  * (the sample-vs-population n/(n−1) cancels in every ratio); alpha
  * and the item statistics are ONE shared-text double each (sqrt
  * IEEE-exact for r_j); degenerate scales (var_total = 0, var-free
  * dropped scale, k < 3 for α₋ⱼ) go NULL via nullif/CASE.
  *
  * Plan/scale: one scan → (case, item) cell aggregate (calendar×level
  * — dimension-grade by construction, the q177 class) → dense-filled
  * grid (absent cells are true zeros) → case totals broadcast back →
  * one per-item aggregate + a broadcast scale-total row. */
object Cronbach {

  /** Alpha + item table from a frame with (i, j, x): case key, item
    * key, exact BIGINT value (one row per case×item; absent → 0 via
    * dense fill upstream of the totals). Returns one row per item:
    * (j, n_cases, k_items, alpha, alpha_dropped, r_item_total). */
  def cronbach(cells: DataFrame): DataFrame = {
    val filled = {
      val cases = cells.select("i").distinct()
      val items = cells.select("j").distinct()
      cases.crossJoin(broadcast(items))
        .join(cells, Seq("i", "j"), "left")
        .withColumn("x", coalesce(col("x"), lit(0L)))
        .localCheckpoint(true) // feeds case totals AND item sums
    }
    val caseTotals = filled.groupBy("i")
      .agg(expr("CAST(sum(x) AS BIGINT)").as("t"))
    val scale = caseTotals.agg(
      expr("CAST(count(1) AS BIGINT)").as("n_cases"),
      expr("CAST(sum(t) AS DECIMAL(38,0))").as("s_tot"),
      expr("CAST(sum(CAST(t AS DECIMAL(38,0)) * t) AS DECIMAL(38,0))")
        .as("q_tot"))
    val items = filled.join(broadcast(caseTotals), "i")
      .groupBy("j")
      .agg(
        expr("CAST(sum(x) AS DECIMAL(38,0))").as("s_j"),
        expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))")
          .as("q_j"),
        expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * t) AS DECIMAL(38,0))")
          .as("p_j"))
      .crossJoin(broadcast(scale))
      .selectExpr("j", "n_cases", "s_j", "s_tot",
        "CAST(n_cases AS DECIMAL(38,0)) * q_j - s_j * s_j AS m_j",
        "CAST(n_cases AS DECIMAL(38,0)) * p_j - s_j * s_tot AS c_j",
        "CAST(n_cases AS DECIMAL(38,0)) * q_tot - s_tot * s_tot AS m_tot")
    val sums = items.agg(
      expr("CAST(count(1) AS BIGINT)").as("k_items"),
      expr("CAST(sum(m_j) AS DECIMAL(38,0))").as("m_sum"))
    items.crossJoin(broadcast(sums))
      .withColumn("m_drop", expr("m_tot + m_j - 2 * c_j"))
      .selectExpr("j", "n_cases", "k_items",
        s"round($AlphaSql, 6) + 0.0 AS alpha",
        s"round($AlphaDropSql, 6) + 0.0 AS alpha_dropped",
        s"round($RSql, 6) + 0.0 AS r_item_total")
      .orderBy("j")
  }

  /** Shared-text α — NULL on k < 2 or a variance-free scale. */
  private val AlphaSql = {
    val kd = "CAST(k_items AS DOUBLE)"
    s"(CASE WHEN k_items < 2 OR n_cases < 2 THEN NULL" +
      s" ELSE $kd / ($kd - 1.0) * (1.0 - CAST(m_sum AS DOUBLE)" +
      s" / nullif(CAST(m_tot AS DOUBLE), 0.0)) END)"
  }

  /** α with item j removed — NULL on k < 3 or a degenerate remainder. */
  private val AlphaDropSql = {
    val kd = "CAST(k_items AS DOUBLE)"
    s"(CASE WHEN k_items < 3 OR n_cases < 2 THEN NULL" +
      s" ELSE ($kd - 1.0) / ($kd - 2.0)" +
      s" * (1.0 - (CAST(m_sum AS DOUBLE) - CAST(m_j AS DOUBLE))" +
      s" / nullif(CAST(m_drop AS DOUBLE), 0.0)) END)"
  }

  /** Corrected item-total correlation — NULL when either side is
    * constant. */
  private val RSql =
    "(CASE WHEN n_cases < 2 THEN NULL" +
      " ELSE (CAST(c_j AS DOUBLE) - CAST(m_j AS DOUBLE))" +
      " / nullif(sqrt(CAST(m_j AS DOUBLE) * CAST(m_drop AS DOUBLE)), 0.0)" +
      " END)"

  /** q183: do the five order priorities' monthly revenues move together
    * (one market pulse) or independently? Cases = order months, items =
    * priorities, x = exact cent revenue. */
  def priorityMonthAlpha(spark: SparkSession, dir: String): DataFrame =
    cronbach(Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_orderpriority").isNotNull
        && col("o_totalprice").isNotNull)
      .groupBy(
        expr("year(CAST(o_orderdate AS DATE)) * 100" +
          " + month(CAST(o_orderdate AS DATE))").as("i"),
        expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("j"))
      .agg(expr("CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT))" +
        " AS BIGINT)").as("x")))
      .withColumnRenamed("j", "o_priority")

  /** DuckDB twin: identical cells, dense fill, numerators, finish. */
  val priorityMonthAlphaSql: String =
    s"""WITH cells0 AS (
       |  SELECT year(CAST(o_orderdate AS DATE)) * 100
       |      + month(CAST(o_orderdate AS DATE)) AS i,
       |    CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS j,
       |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS x
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
       |    AND o_totalprice IS NOT NULL
       |  GROUP BY 1, 2),
       |filled AS (
       |  SELECT c.i, it.j, coalesce(cells0.x, 0) AS x
       |  FROM (SELECT DISTINCT i FROM cells0) c
       |  CROSS JOIN (SELECT DISTINCT j FROM cells0) it
       |  LEFT JOIN cells0 ON cells0.i = c.i AND cells0.j = it.j),
       |case_totals AS (
       |  SELECT i, CAST(sum(x) AS BIGINT) AS t FROM filled GROUP BY 1),
       |scale AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_cases,
       |    CAST(sum(t) AS HUGEINT) AS s_tot,
       |    CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS q_tot
       |  FROM case_totals),
       |items AS (
       |  SELECT j, n_cases, s_j, s_tot,
       |    CAST(n_cases AS HUGEINT) * q_j - s_j * s_j AS m_j,
       |    CAST(n_cases AS HUGEINT) * p_j - s_j * s_tot AS c_j,
       |    CAST(n_cases AS HUGEINT) * q_tot - s_tot * s_tot AS m_tot
       |  FROM (
       |    SELECT j,
       |      CAST(sum(x) AS HUGEINT) AS s_j,
       |      CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q_j,
       |      CAST(sum(CAST(x AS HUGEINT) * t) AS HUGEINT) AS p_j
       |    FROM filled JOIN case_totals ON filled.i = case_totals.i
       |    GROUP BY 1) CROSS JOIN scale),
       |sums AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k_items,
       |    CAST(sum(m_j) AS HUGEINT) AS m_sum
       |  FROM items),
       |full_tab AS (
       |  SELECT items.*, k_items, m_sum, m_tot + m_j - 2 * c_j AS m_drop
       |  FROM items CROSS JOIN sums)
       |SELECT j AS o_priority, n_cases, k_items,
       |  round($AlphaSql, 6) + 0.0 AS alpha,
       |  round($AlphaDropSql, 6) + 0.0 AS alpha_dropped,
       |  round($RSql, 6) + 0.0 AS r_item_total
       |FROM full_tab
       |ORDER BY o_priority""".stripMargin
}
