package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Hurst exponent via rescaled-range (R/S) analysis — the long-memory
  * diagnostic the autocorrelation deck can't give: q111 ACF reads
  * dependence at ONE lag, q173 Ljung–Box tests "any dependence at lags
  * ≤ h", but neither answers "does dependence DECAY — or does the
  * series carry persistent memory that makes every q272-style forecast
  * interval too narrow?" Mandelbrot–Wallis R/S: for block size n,
  * R/S(n) = range of the mean-adjusted cumulative sum over its std
  * dev; E[R/S(n)] ∝ n^H. H ≈ 0.5 is a random walk, H > 0.5 persistent
  * (trends compound), H < 0.5 anti-persistent (mean-reverting).
  *
  * Exactness: per block everything is integer until one shared chain —
  * with S1 = Σy (cents) and the in-block cumulative C_j, the scaled
  * deviation Z_j = n·C_j − (j+1)·S1 is an exact BIGINT, so n·R =
  * max Z − min Z exactly; with w_j = n·y_j − S1 (exact),
  * n³·S² = Σw² exactly (DECIMAL(38,0) — w² reaches ~4e21 at sf1), and
  * R/S = (max Z − min Z)·√n / √Σw² is ONE shared-text double chain.
  * Per-size means are 1e-6 floors integer-summed (order-free); the
  * four-point log–log slope rides 1e-6-floored lnSnap'd coordinates
  * through exact integer sums into one closed-form division.
  *
  * Plan/scale: one scan → day cells (the q105/q207 frame) → a
  * |sizes|-way broadcast fan-out of the DAY-CELL frame (never fact
  * rows) → per-(size, block) windows over value-level data → two tiny
  * aggregates. The single global row_number window runs over ~2.4k day
  * cells — the q48/q181 value-level class, not a corpus sort. */
object Hurst {

  /** Registered block sizes: dyadic ladder, smallest 8 so S is a real
    * std dev, largest 64 so even sf0.001's ~2.4k-day series keeps
    * ~37 blocks in the largest cell. */
  val Sizes: Seq[Int] = Seq(8, 16, 32, 64)

  private def lnSnap(x: String): String =
    s"CAST(floor(ln($x) * 1e9 + 5e-1) AS DOUBLE) / 1e9"

  /** Shared-text per-block R/S from (n, zr = maxZ−minZ, sw2 = Σw²). */
  private val RsSql =
    "(CAST(zr AS DOUBLE) * sqrt(CAST(win_n AS DOUBLE))" +
      " / nullif(sqrt(CAST(sw2 AS DOUBLE)), 0.0))"

  /** R/S ladder + Hurst slope from an indexed series (i, y): 0-based
    * contiguous index, exact integer values. One row per block size:
    * (win_n, n_blocks, rs_mean, hurst) — hurst identical on every row;
    * NULL when fewer than two sizes keep a block. */
  def hurstRs(series: DataFrame, sizes: Seq[Int] = Sizes): DataFrame = {
    val sized = series
      .crossJoin(broadcast(
        series.sparkSession.range(0, 1).selectExpr(
          s"explode(array(${sizes.mkString(", ")})) AS win_n")))
      .withColumn("blk", expr("i div win_n"))
      .withColumn("pos", expr("i % win_n"))
    // drop each size's ragged tail block (blocks are full by contract)
    val full = sized
      .withColumn("n_i", count(lit(1)).over(Window.partitionBy("win_n")))
      .filter(expr("(blk + 1) * win_n <= n_i"))
    val wBlk = Window.partitionBy("win_n", "blk")
    val wCum = wBlk.orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blocks = full
      .withColumn("cum", sum("y").over(wCum))
      .withColumn("s1", sum("y").over(wBlk))
      .withColumn("z", expr("win_n * cum - (pos + 1) * s1"))
      .withColumn("w", expr("win_n * y - s1"))
      .groupBy("win_n", "blk")
      .agg(
        expr("CAST(max(z) - min(z) AS BIGINT)").as("zr"),
        expr("CAST(sum(CAST(w AS DECIMAL(38,0)) * CAST(w AS DECIMAL(38,0)))" +
          " AS DECIMAL(38,0))").as("sw2"))
      .selectExpr("win_n", s"$RsSql AS rs")
      .filter(col("rs").isNotNull)
    val perSize = blocks
      .groupBy("win_n")
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(expr("CAST(floor(rs * 1e6) AS BIGINT)")).as("s_rs"))
      .selectExpr("win_n", "n_blocks",
        "CAST(s_rs AS DOUBLE) / CAST(n_blocks AS DOUBLE) / 1e6 AS rs_mean")
    val fit = perSize
      .selectExpr(
        s"CAST(floor((${lnSnap("CAST(win_n AS DOUBLE)")}) * 1e6) AS BIGINT) AS x",
        s"CAST(floor((${lnSnap("rs_mean")}) * 1e6) AS BIGINT) AS y")
      .agg(
        count(lit(1)).as("k"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .selectExpr(
        "CASE WHEN k >= 2 AND k * sxx - sx * sx != 0 THEN " +
          "round(CAST(k * sxy - sx * sy AS DOUBLE)" +
          " / CAST(k * sxx - sx * sx AS DOUBLE), 4) + 0.0 END AS hurst")
    perSize.crossJoin(broadcast(fit))
      .selectExpr("win_n", "n_blocks",
        "round(rs_mean, 6) + 0.0 AS rs_mean", "hurst")
  }

  /** q280: long memory of the global daily-revenue series — the
    * q105/q207 day-cell frame, indexed by trading-day rank so calendar
    * gaps never split a block. */
  def dailyRevenueHurst(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS d",
        "CAST(floor(o_totalprice * 1e2) AS BIGINT) AS cents")
      .groupBy("d")
      .agg(expr("CAST(sum(cents) AS BIGINT)").as("y"))
    hurstRs(daily
      .withColumn("i",
        (row_number().over(Window.orderBy("d")) - 1).cast("long"))
      .select("i", "y"))
  }

  /** DuckDB twin: identical day cells, blocks, integer R/S chain,
    * fixed-point slope. */
  val dailyRevenueHurstSql: String =
    s"""WITH daily AS (
       |  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
       |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS y
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1),
       |idx AS (
       |  SELECT CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS i, y
       |  FROM daily),
       |sized AS (
       |  SELECT i, y, win_n, i // win_n AS blk, i % win_n AS pos
       |  FROM idx CROSS JOIN (
       |    SELECT unnest([${Sizes.mkString(", ")}]) AS win_n)),
       |full_blocks AS (
       |  SELECT * FROM (
       |    SELECT *, count(*) OVER (PARTITION BY win_n) AS n_i FROM sized)
       |  WHERE (blk + 1) * win_n <= n_i),
       |walked AS (
       |  SELECT win_n, blk, pos, y,
       |    sum(y) OVER (PARTITION BY win_n, blk ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(y) OVER (PARTITION BY win_n, blk) AS s1
       |  FROM full_blocks),
       |blocks AS (
       |  SELECT win_n, blk,
       |    CAST(max(win_n * cum - (pos + 1) * s1)
       |      - min(win_n * cum - (pos + 1) * s1) AS BIGINT) AS zr,
       |    CAST(sum(CAST(win_n * y - s1 AS HUGEINT)
       |      * CAST(win_n * y - s1 AS HUGEINT)) AS HUGEINT) AS sw2
       |  FROM walked GROUP BY 1, 2),
       |rs AS (
       |  SELECT win_n, $RsSql AS rs FROM blocks),
       |per_size AS (
       |  SELECT win_n, count(*) AS n_blocks,
       |    CAST(sum(CAST(floor(rs * 1e6) AS BIGINT)) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE) / 1e6 AS rs_mean
       |  FROM rs WHERE rs IS NOT NULL GROUP BY 1),
       |pts AS (
       |  SELECT CAST(floor((${lnSnap("CAST(win_n AS DOUBLE)")}) * 1e6) AS BIGINT) AS x,
       |    CAST(floor((${lnSnap("rs_mean")}) * 1e6) AS BIGINT) AS y
       |  FROM per_size),
       |fit AS (
       |  SELECT CASE WHEN count(*) >= 2
       |      AND count(*) * sum(x * x) - sum(x) * sum(x) != 0 THEN
       |    round(CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
       |      / CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE), 4) + 0.0
       |    END AS hurst
       |  FROM pts)
       |SELECT win_n, n_blocks, round(rs_mean, 6) + 0.0 AS rs_mean, hurst
       |FROM per_size CROSS JOIN fit""".stripMargin
}
