package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** p-chart (attribute control chart) — the PROPORTION member of the
  * SPC pair. q236's Shewhart x̄ chart watches a continuous level; the
  * defect-RATE questions (fraction of orders stuck unfulfilled, share
  * of lineitems returned) need the binomial chart with per-day limits
  * that widen on thin days:
  *
  *   UCL/LCL_t = p̄ ± 3·√(p̄(1−p̄)/n_t)
  *
  * — a day is out of control only if its rate clears ITS OWN sample
  * size's band (the varying-n p-chart; a fixed band would false-alarm
  * every quiet day).
  *
  * Exactness: day cells are exact integer (defects, totals); p̄ is one
  * global rational; each day's z = (x_t·N − d_t·n_t... ) is carried as
  * the shared chain z_t = (p̂_t − p̄)/√(p̄(1−p̄)/n_t) over exact-integer
  * recoveries, floored to 1e-6 z-units so the 3σ verdict and the
  * worst-day argmax are INTEGER comparisons (min-day tie-break, the
  * q283 discipline).
  *
  * Plan/scale: one corpus scan → day cells → one broadcast global
  * rate → one keyed aggregate + a value-level argmax join. */
object PChart {

  /** p-chart audit per group from (g, d, defect 0/1): one row per
    * group — (g, n_days, pbar_ppm, n_oob, worst_day, worst_absz).
    * Groups whose p̄ is degenerate (0 or 1: no variance) report NULL
    * chart columns. */
  def pChart(rows: DataFrame): DataFrame = {
    val days = rows
      .filter(col("d").isNotNull && col("defect").isNotNull)
      .groupBy("g", "d")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_t"),
        expr("CAST(sum(defect) AS BIGINT)").as("x_t"))
      .localCheckpoint(true) // global rate + z scan + argmax
    val tot = days.groupBy("g")
      .agg(
        expr("CAST(sum(n_t) AS BIGINT)").as("n_all"),
        expr("CAST(sum(x_t) AS BIGINT)").as("x_all"),
        expr("CAST(count(1) AS BIGINT)").as("n_days"))
      .selectExpr("g", "n_all", "n_days",
        "x_all * 1000000 div n_all AS pbar_ppm",
        "CAST(x_all AS DOUBLE) / CAST(n_all AS DOUBLE) AS pbar",
        "CASE WHEN x_all > 0 AND x_all < n_all THEN 1 ELSE 0 END AS ok")
    val zs = days
      .join(broadcast(tot), "g")
      .withColumn("z_micro", expr(
        "CASE WHEN ok = 1 THEN CAST(floor(" +
          "abs(CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE) - pbar)" +
          " / sqrt(pbar * (1.0 - pbar) / CAST(n_t AS DOUBLE)) * 1e6)" +
          " AS BIGINT) END"))
      .localCheckpoint(true) // audit + argmax share it
    val audit = zs.groupBy("g", "n_days", "pbar_ppm")
      .agg(
        max("z_micro").as("max_zm"),
        sum(expr("CAST(z_micro > 3000000 AS BIGINT)")).as("n_oob"))
    zs.select(col("g"), col("d"), col("z_micro"))
      .join(broadcast(audit), "g")
      // null-safe: a degenerate group (all z NULL) still reports its
      // row — worst_day degrades to the first day, worst_absz NULL
      .filter(col("z_micro") <=> col("max_zm"))
      .groupBy("g", "n_days", "pbar_ppm", "max_zm", "n_oob")
      .agg(min("d").as("worst_day"))
      .selectExpr("g", "n_days", "pbar_ppm", "n_oob",
        "CAST(worst_day AS BIGINT) AS worst_day",
        "round(CAST(max_zm AS DOUBLE) / 1e6, 4) + 0.0 AS worst_absz")
  }

  /** q293: daily unfulfilled-rate (o_orderstatus = 'F') control chart
    * per priority — q236's partner on the attribute axis. */
  def orderStatusPChart(spark: SparkSession, dir: String): DataFrame =
    pChart(Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_orderstatus").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS d",
        "CAST(o_orderstatus = 'F' AS INT) AS defect"))
      .withColumnRenamed("g", "o_orderpriority")

  /** DuckDB twin: identical cells, rate, micro z-grid, argmax. */
  val orderStatusPChartSql: String =
    """WITH days AS (
      |  SELECT o_orderpriority AS g,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
      |    CAST(count(*) AS BIGINT) AS n_t,
      |    CAST(sum(CAST(o_orderstatus = 'F' AS INT)) AS BIGINT) AS x_t
      |  FROM orders
      |  WHERE o_orderdate IS NOT NULL AND o_orderstatus IS NOT NULL
      |  GROUP BY 1, 2),
      |tot AS (
      |  SELECT g, CAST(sum(n_t) AS BIGINT) AS n_all,
      |    CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(x_t) AS BIGINT) * 1000000 // CAST(sum(n_t) AS BIGINT)
      |      AS pbar_ppm,
      |    CAST(sum(x_t) AS DOUBLE) / CAST(sum(n_t) AS DOUBLE) AS pbar,
      |    CASE WHEN sum(x_t) > 0 AND sum(x_t) < sum(n_t) THEN 1 ELSE 0 END
      |      AS ok
      |  FROM days GROUP BY 1),
      |zs AS (
      |  SELECT days.g, d, n_days, pbar_ppm,
      |    CASE WHEN ok = 1 THEN CAST(floor(
      |      abs(CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE) - pbar)
      |      / sqrt(pbar * (1.0 - pbar) / CAST(n_t AS DOUBLE)) * 1e6)
      |      AS BIGINT) END AS z_micro
      |  FROM days JOIN tot ON days.g = tot.g),
      |audit AS (
      |  SELECT g, n_days, pbar_ppm, max(z_micro) AS max_zm,
      |    CAST(sum(CAST(z_micro > 3000000 AS BIGINT)) AS BIGINT) AS n_oob
      |  FROM zs GROUP BY 1, 2, 3)
      |SELECT z.g AS o_orderpriority, z.n_days, z.pbar_ppm, n_oob,
      |  CAST(min(d) AS BIGINT) AS worst_day,
      |  round(CAST(max_zm AS DOUBLE) / 1e6, 4) + 0.0 AS worst_absz
      |FROM zs z JOIN audit a
      |  ON z.g = a.g AND z.z_micro IS NOT DISTINCT FROM a.max_zm
      |GROUP BY 1, 2, 3, n_oob, max_zm""".stripMargin
}
