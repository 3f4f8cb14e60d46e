package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Pettitt changepoint test — the RANK-BASED single-changepoint
  * locator: q134's AMOC splits on means (level shifts in cents), which
  * a few outlier days can fake; Pettitt asks the same "where did the
  * series break?" question on RANKS, so it finds a distributional
  * shift without trusting magnitudes. U_t = Σ_{i≤t}Σ_{j>t} sgn(x_j −
  * x_i), K = max_t |U_t|, with the classic closed-form tail
  * p ≈ 2·exp(−6K²/(n³ + n²)). The q102/q97 robustness stance applied
  * to changepoint detection.
  *
  * Exactness: U_t collapses to ranks — with tie midranks,
  * U_t = 2·R_t − t(n+1) where R_t is the cumulative midrank sum, and
  * on the DOUBLED rank scale (r2 = 2·cumBefore + n_cell + 1, the q97
  * trick) 2·R_t = Σr2 is an exact BIGINT, so every
  * U_t = Σr2 − t(n+1) is exact. K is an integer max; the changepoint
  * is the FIRST bucket achieving |U| = K (min-t election over exact
  * integers — deterministic in both engines). p's input
  * −6K²/(n³+n²) is one shared-text rational double; exp is libm, so
  * its output is snapped to the 1e-9 grid (house rule), doubled,
  * clamped to 1 (the closed form exceeds 1 at tiny K by
  * construction), round-6.
  *
  * Plan/scale: the fact table collapses to DAY cells in one keyed
  * aggregate; midranks come from one window over the VALUE-CELL frame
  * (distinct revenue values — q48 class) + an equi-join back; the U
  * walk is one window over the CALENDAR-CELL frame (q100-class
  * dimension-grade). The walk frame feeds BOTH the K max and the
  * argmin-day election, so it is materialized once (localCheckpoint —
  * the house no-duplicate-subtree rule) before the 1-row finish.
  * Row-grade data never meets a window. */
object Pettitt {

  /** Pettitt test over a cell series (tCol orderable bucket, xCol
    * exact BIGINT value). Returns one row:
    * (n_buckets, k_stat, change_bucket, p_value) — change_bucket the
    * first bucket achieving |U| = K (the last pre-shift bucket);
    * NULL row fields when the series has < 2 buckets. */
  def pettitt(series: DataFrame, tCol: String, xCol: String): DataFrame = {
    val days = series
      .filter(col(tCol).isNotNull && col(xCol).isNotNull)
      .select(col(tCol).as("t"), col(xCol).as("x"))
    val cells = days.groupBy("x").agg(count(lit(1)).as("nc"))
    val wv = Window.orderBy(col("x")).rowsBetween(Window.unboundedPreceding, -1)
    val rankedCells = cells
      .withColumn("cb", coalesce(sum(col("nc")).over(wv), lit(0L)))
      .withColumn("r2", expr("2 * cb + nc + 1"))
      .select(col("x"), col("r2"))
    val wt = Window.orderBy(col("t"))
    val walk = days.join(rankedCells, "x")
      .withColumn("r2sum", sum(col("r2")).over(
        wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tix", row_number().over(wt).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .filter(col("tix") < col("n"))
      .selectExpr("t", "n", "abs(r2sum - tix * (n + 1)) AS au")
      .localCheckpoint(true) // day-grade; consumed by K max AND argmin
    val kRow = walk.groupBy("n").agg(max(col("au")).as("k_stat"))
    walk.join(broadcast(kRow), "n")
      .filter(col("au") === col("k_stat"))
      .groupBy("n", "k_stat")
      .agg(min(col("t")).as("change_bucket"))
      .selectExpr("n AS n_buckets", "k_stat", "change_bucket",
        s"round(least($PSql, 1.0), 6) + 0.0 AS p_value")
  }

  /** Shared-text p = 2·exp(−6K²/(n³+n²)) on the full bucket count n
    * (the walk excludes only the final bucket, where U = 0 by
    * identity), exp snapped to the 1e-9 grid. */
  private val PSql = {
    val m = "CAST(n AS DOUBLE)"
    val arg = s"(-6.0 * CAST(k_stat AS DOUBLE) * CAST(k_stat AS DOUBLE)" +
      s" / ($m * $m * $m + $m * $m))"
    s"(2.0 * CAST(floor(exp($arg) * 1e9 + 0.5) AS DOUBLE) / 1e9)"
  }

  /** q174: where did daily order revenue break, rank-wise? The q134
    * frame, rank-tested. */
  def dailyRevenuePettitt(spark: SparkSession, dir: String): DataFrame =
    pettitt(
      Tables.orders(spark, dir)
        .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
        .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(expr("CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT))" +
          " AS BIGINT)").as("rev")),
      "day", "rev")

  /** DuckDB twin: identical day cells, midrank cells, U walk, and
    * election. */
  val dailyRevenuePettittSql: String =
    s"""WITH days AS (
       |  SELECT CAST(o_orderdate AS DATE) AS t,
       |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS x
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1),
       |cells AS (
       |  SELECT x, CAST(count(*) AS BIGINT) AS nc FROM days GROUP BY 1),
       |rankedcells AS (
       |  SELECT x,
       |    2 * coalesce(CAST(sum(nc) OVER (ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |    + nc + 1 AS r2
       |  FROM cells),
       |walk0 AS (
       |  SELECT d.t,
       |    CAST(sum(r.r2) OVER (ORDER BY d.t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS r2sum,
       |    CAST(row_number() OVER (ORDER BY d.t) AS BIGINT) AS tix,
       |    CAST(count(*) OVER () AS BIGINT) AS n
       |  FROM days d JOIN rankedcells r USING (x)),
       |walk AS (
       |  SELECT t, n, abs(r2sum - tix * (n + 1)) AS au
       |  FROM walk0 WHERE tix < n),
       |k AS (SELECT n, CAST(max(au) AS BIGINT) AS k_stat FROM walk GROUP BY 1)
       |SELECT n AS n_buckets, k_stat,
       |  min(t) AS change_bucket,
       |  round(least($PSql, 1.0), 6) + 0.0 AS p_value
       |FROM walk JOIN k USING (n)
       |WHERE au = k_stat
       |GROUP BY n, k_stat""".stripMargin
}
