package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Shewhart x̄ control chart — the PROCESS-CONTROL lens the monitoring
  * deck renders everywhere else as tests: q105/q226 accumulate drift
  * evidence, q86 compares two snapshots; the control chart is what an
  * operations dashboard actually shows — per-subgroup means against
  * ±3σ limits derived from WITHIN-subgroup spread (so a between-week
  * shift cannot inflate its own limits — the whole point of the
  * chart):
  *
  *   center = grand mean,  s_p² = Σ_w SS_w / Σ_w (n_w − 1)
  *   z_w = (x̄_w − center) / (s_p / √n_w),   flag at |z| > 3
  *
  * Exactness: subgroups are CALENDAR weeks (t div 7 — one shared
  * integer expression); per-subgroup sums exact; each subgroup's
  * within-SS (n_w·Σx² − (Σx)²)/n_w is the one rational step,
  * micro-floored per subgroup and BIGINT-summed (q91); center and
  * every z ride ONE shared-text chain on exactly-recovered doubles;
  * s_p = 0 (all-constant weeks) → NULL z.
  *
  * Plan/scale: one corpus-touch daily aggregate → one keyed
  * (group, week) aggregate → group-grade chart stats broadcast back
  * onto the week rows (calendar-bounded row count). No windows. */
object Shewhart {

  private val SpSql =
    "sqrt(CAST(ssw_i AS DOUBLE) / 1e6 / nullif(CAST(df_w AS DOUBLE), 0e0))"
  private val CenterSql = "(CAST(sx_all AS DOUBLE) / CAST(n_all AS DOUBLE))"
  private val ZSql =
    s"((CAST(sx_w AS DOUBLE) / CAST(n_w AS DOUBLE) - $CenterSql)" +
      s" / nullif($SpSql / sqrt(CAST(n_w AS DOUBLE)), 0e0))"

  /** Chart rows per (g, week) from (g, t, x): group, integer day,
    * exact BIGINT value. Columns: (g, week, n_days, week_mean,
    * center, z, flagged). */
  def xbarChart(series: DataFrame): DataFrame = {
    val weeks = series.select("g", "t", "x")
      .withColumn("week", expr("CAST(t div 7 AS BIGINT)"))
      .groupBy("g", "week")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_w"),
        expr("CAST(sum(x) AS DECIMAL(38,0))").as("sx_w"),
        expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))")
          .as("sxx_w"))
      .localCheckpoint(true) // the chart stats and the rows both read it
    val stats = weeks.groupBy("g").agg(
      expr("CAST(sum(n_w) AS BIGINT)").as("n_all"),
      expr("CAST(sum(sx_w) AS DECIMAL(38,0))").as("sx_all"),
      expr("CAST(sum(n_w - 1) AS BIGINT)").as("df_w"),
      // DECIMAL(38,0), not BIGINT: dollar²-scale SS × the 1e6 grid
      // overflows long once weeks accumulate (hit at sf0.01)
      expr("CAST(sum(CASE WHEN n_w >= 1 THEN CAST(floor(" +
        "CAST(CAST(n_w AS DECIMAL(38,0)) * sxx_w - sx_w * sx_w AS DOUBLE)" +
        " / CAST(n_w AS DOUBLE) * 1e6) AS DECIMAL(38,0)) END)" +
        " AS DECIMAL(38,0))").as("ssw_i"))
    weeks.join(broadcast(stats), "g")
      .selectExpr("g", "week", "n_w AS n_days",
        "round(CAST(sx_w AS DOUBLE) / CAST(n_w AS DOUBLE), 4) + 0.0" +
          " AS week_mean",
        s"round($CenterSql, 4) + 0.0 AS center",
        s"CASE WHEN $SpSql > 0e0 THEN round($ZSql, 4) + 0.0 END AS z",
        s"CASE WHEN $SpSql > 0e0 THEN abs($ZSql) > 3.0 END AS flagged")
  }

  /** q236: the weekly revenue x̄ chart per priority — the dashboard
    * form of the q209–q226 series (dollar units; weeks = day div 7 on
    * the shared epoch offset). */
  def weeklyRevenueChart(spark: SparkSession, dir: String): DataFrame =
    xbarChart(Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS t",
        "CAST(floor(o_totalprice) AS BIGINT) AS usd")
      .groupBy("g", "t")
      .agg(expr("CAST(sum(usd) AS BIGINT)").as("x")))
      .withColumnRenamed("g", "o_orderpriority")

  /** DuckDB twin: identical week cells, micro-floored within-SS, and
    * shared chart chain. */
  val weeklyRevenueChartSql: String =
    s"""WITH daily AS (
       |  SELECT o_orderpriority AS g,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS t,
       |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS x
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1, 2),
       |weeks AS (
       |  SELECT g, CAST(t // 7 AS BIGINT) AS week,
       |    CAST(count(*) AS BIGINT) AS n_w,
       |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx_w,
       |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx_w
       |  FROM daily GROUP BY 1, 2),
       |stats AS (
       |  SELECT g, CAST(sum(n_w) AS BIGINT) AS n_all,
       |    CAST(sum(sx_w) AS HUGEINT) AS sx_all,
       |    CAST(sum(n_w - 1) AS BIGINT) AS df_w,
       |    CAST(sum(CASE WHEN n_w >= 1 THEN CAST(floor(
       |      CAST(CAST(n_w AS HUGEINT) * sxx_w - sx_w * sx_w AS DOUBLE)
       |      / CAST(n_w AS DOUBLE) * 1e6) AS HUGEINT) END) AS HUGEINT) AS ssw_i
       |  FROM weeks GROUP BY 1)
       |SELECT w.g AS o_orderpriority, week, n_w AS n_days,
       |  round(CAST(sx_w AS DOUBLE) / CAST(n_w AS DOUBLE), 4) + 0.0
       |    AS week_mean,
       |  round($CenterSql, 4) + 0.0 AS center,
       |  CASE WHEN $SpSql > 0e0 THEN round($ZSql, 4) + 0.0 END AS z,
       |  CASE WHEN $SpSql > 0e0 THEN abs($ZSql) > 3.0 END AS flagged
       |FROM weeks w JOIN stats s ON w.g = s.g""".stripMargin
}
