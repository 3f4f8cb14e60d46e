package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Robust outlier detection via Median Absolute Deviation — the
  * resistant alternative to q8's z-score (one corrupt batch of
  * scraped numbers shifts a mean/stddev fence arbitrarily; the MAD
  * fence moves only if half the data moves). The standard rule:
  * outlier ⟺ |x − median| > k · 1.4826 · MAD (1.4826 ≈ consistency
  * constant for normal data, k = 3).
  *
  * EXACTNESS: interpolated medians of doubles are the one statistic
  * the §5 rules can't snap safely (Spark's `(1−d)·a + d·b` vs
  * DuckDB's `a + d·(b−a)` can differ in the last ulp). Solution:
  * operate on 2× integer cents — `CAST(round(x·100) AS BIGINT) * 2`.
  * Midpoints of even integers are computed EXACTLY by both engines'
  * interpolation formulas (every intermediate is an exact double), so
  * medians, deviations, and MADs are bit-identical with no rounding
  * anywhere before the display columns.
  *
  * Plan: two keyed aggregates (median fit, MAD fit) + one broadcast
  * join of the dimension-grade per-group medians + a final counting
  * aggregate. The exact `percentile` buffers each group's values —
  * fine for dimension-grade groups; swap in `approx_percentile`
  * ([[Relational.percentilesApprox]] / s3 precedent) for fact-scale
  * groups — the plan shape is unchanged.
  */
object Robust {

  /** Outlier fence multiplier (k · consistency constant). */
  val FenceSql = "3 * 1.4826"

  /** q71: per-segment robust stats over customer balances:
    * (segment, n_rows, med, mad, n_outliers). */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val x2 = customerCents(Tables.customer(spark, dir))
    val med = x2.groupBy("segment")
      .agg(expr("percentile(x2, 0.5)").as("med2"))
    val dev = x2.join(broadcast(med), "segment")
      .withColumn("dev2", abs(col("x2") - col("med2")))
    val mad = dev.groupBy("segment")
      .agg(expr("percentile(dev2, 0.5)").as("mad2"))
    dev.join(broadcast(mad), "segment")
      .groupBy(col("segment"))
      .agg(
        count(lit(1)).as("n_rows"),
        (round(max(col("med2")) / 200, 4) + 0.0).as("med"),
        (round(max(col("mad2")) / 200, 4) + 0.0).as("mad"),
        sum(expr(s"CASE WHEN dev2 > $FenceSql * mad2 THEN 1 ELSE 0 END"))
          .cast("long").as("n_outliers"))
  }

  /** 2× integer cents of the balance (exact-median input form). */
  private def customerCents(customer: DataFrame): DataFrame =
    customer.selectExpr("c_mktsegment AS segment",
      "CAST(round(c_acctbal * 100) AS BIGINT) * 2 AS x2")

  val madOutliersSql: String =
    s"""WITH x AS (
       |  SELECT c_mktsegment AS segment,
       |    CAST(round(c_acctbal * 100) AS BIGINT) * 2 AS x2
       |  FROM customer),
       |med AS (
       |  SELECT segment, quantile_cont(x2, 0.5) AS med2 FROM x GROUP BY 1),
       |dev AS (
       |  SELECT x.segment, abs(x.x2 - m.med2) AS dev2, m.med2
       |  FROM x JOIN med m USING (segment)),
       |mad AS (
       |  SELECT segment, quantile_cont(dev2, 0.5) AS mad2 FROM dev GROUP BY 1)
       |SELECT d.segment, count(*) AS n_rows,
       |  round(max(d.med2) / 200, 4) + 0.0 AS med,
       |  round(max(m.mad2) / 200, 4) + 0.0 AS mad,
       |  CAST(sum(CASE WHEN d.dev2 > $FenceSql * m.mad2 THEN 1 ELSE 0 END)
       |       AS BIGINT) AS n_outliers
       |FROM dev d JOIN mad m USING (segment)
       |GROUP BY 1""".stripMargin

  // ------------------------------------------------------------- Theil–Sen

  /** Theil–Sen robust line fit per group: slope = weighted LOWER
    * median of the pairwise slopes (y_j−y_i)/(x_j−x_i) over x-distinct
    * point pairs, intercept = weighted lower median of the residuals
    * y − m·x. The resistant alternative to q32's least squares — up to
    * ~29% of the rows can be arbitrarily corrupt before the fit moves
    * (the breakdown point the reference's scraped vote counts would
    * want), where one bad row already owns an OLS slope.
    *
    * Value-level formulation (the q101 cell-grid trick): points
    * collapse to cells (g, vx, vy, cnt); pair slopes live on the
    * CELL-PAIR grid with weight cnt_i·cnt_j (decimal-first, exact past
    * 2^31-row cells), so the pair "explosion" is quadratic in value
    * cardinality, never in rows. The weighted median is the smallest
    * value whose doubled cumulative weight reaches the total — an
    * integer comparison, so the pick is exact; the slope itself is ONE
    * shared-text IEEE division, bit-identical cross-engine.
    *
    * NULL convention: a group whose x is constant has no pair slopes →
    * slope and intercept NULL (nullif-free — the join back is simply
    * empty and the left join leaves NULLs).
    *
    * Plan: one fact scan → cell aggregate (localCheckpointed, reused
    * by the slope and residual paths) → per-group cell self-join +
    * two cardinality-bounded windows partitioned by g. Precondition:
    * |cells|² per group must be dimension-grade — quantize continuous
    * columns first (q47) at 100 TB; since r10 the precondition is
    * ENFORCED: a CellGuard raise_error fires when the slope-cell
    * frame a group's window must swallow exceeds maxCells. */
  def theilSen(df: DataFrame, groupCol: String, xCol: String,
      yCol: String,
      maxCells: Long = CellGuard.DefaultMaxCells): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(xCol).as("vx"), col(yCol).as("vy"))
      .agg(expr("CAST(count(1) AS BIGINT)").as("cnt"))
      .localCheckpoint(true) // value-level; reused by slope + residual paths
    val c1 = cells.select(col("g"), col("vx").as("vx1"), col("vy").as("vy1"),
      col("cnt").as("n1"))
    val c2 = cells.select(col("g").as("g2"), col("vx").as("vx2"),
      col("vy").as("vy2"), col("cnt").as("n2"))
    val cum = Window.partitionBy("g").orderBy("slope")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("g")
    val slopes = c1.join(c2, col("g") === col("g2") && col("vx1") < col("vx2"))
      .select(col("g"), expr("(vy2 - vy1) / (vx2 - vx1)").as("slope"),
        expr("CAST(n1 AS DECIMAL(38,0)) * n2").as("w"))
      .groupBy("g", "slope")
      .agg(expr("CAST(sum(w) AS DECIMAL(38,0))").as("w"))
    val mFit = slopes
      .withColumn("cum", sum("w").over(cum))
      .withColumn("wtot", sum("w").over(tot))
      // guard shares the whole-partition spec — no extra pass
      .withColumn("n_cells", count(lit(1)).over(tot))
      .filter(expr(CellGuard.sqlGuard("theilSen", "n_cells", maxCells)))
      .filter(expr("2 * cum >= wtot"))
      .groupBy("g").agg(min("slope").as("m"))
    val rcum = Window.partitionBy("g").orderBy("r")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bFit = cells.join(mFit, Seq("g"))
      .select(col("g"), expr("vy - m * vx").as("r"), col("cnt"))
      .groupBy("g", "r").agg(expr("CAST(sum(cnt) AS BIGINT)").as("w"))
      .withColumn("cum", sum("w").over(rcum))
      .withColumn("wtot", sum("w").over(tot))
      .filter(expr("2 * cum >= wtot"))
      .groupBy("g").agg(min("r").as("b"))
    cells.groupBy("g").agg(expr("CAST(sum(cnt) AS BIGINT)").as("n_rows"))
      .join(mFit, Seq("g"), "left").join(bFit, Seq("g"), "left")
      .selectExpr(s"g AS $groupCol", "n_rows",
        "round(m, 6) + 0.0 AS slope", "round(b, 6) + 0.0 AS intercept")
  }

  /** q102: robust discount-vs-quantity line per ship year — the
    * outlier-proof twin of what q32 fits by least squares. */
  def lineitemTheilSen(spark: SparkSession, dir: String): DataFrame =
    theilSen(
      Tables.lineitem(spark, dir)
        .withColumn("ship_yr", expr("year(l_shipdate)")),
      "ship_yr", "l_quantity", "l_discount")

  /** DuckDB twin: same cell grid, same exact weighted-median picks
    * (HUGEINT weights mirror Spark's decimal-first products), same
    * shared slope/residual division text. */
  val lineitemTheilSenSql: String =
    s"""WITH cells AS (
       |  SELECT CAST(year(l_shipdate) AS INTEGER) AS g, l_quantity AS vx,
       |    l_discount AS vy, CAST(count(*) AS BIGINT) AS cnt
       |  FROM lineitem
       |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
       |  GROUP BY 1, 2, 3),
       |slopes AS (
       |  SELECT c1.g, (c2.vy - c1.vy) / (c2.vx - c1.vx) AS slope,
       |    CAST(sum(CAST(c1.cnt AS HUGEINT) * c2.cnt) AS HUGEINT) AS w
       |  FROM cells c1 JOIN cells c2 ON c1.g = c2.g AND c1.vx < c2.vx
       |  GROUP BY 1, 2),
       |mfit AS (
       |  SELECT g, min(slope) AS m FROM (
       |    SELECT g, slope,
       |      sum(w) OVER (PARTITION BY g ORDER BY slope
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |      sum(w) OVER (PARTITION BY g) AS wtot
       |    FROM slopes)
       |  WHERE 2 * cum >= wtot GROUP BY 1),
       |resid AS (
       |  SELECT cells.g, vy - m * vx AS r, CAST(sum(cnt) AS BIGINT) AS w
       |  FROM cells JOIN mfit ON cells.g = mfit.g
       |  GROUP BY 1, 2),
       |bfit AS (
       |  SELECT g, min(r) AS b FROM (
       |    SELECT g, r,
       |      sum(w) OVER (PARTITION BY g ORDER BY r
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |      sum(w) OVER (PARTITION BY g) AS wtot
       |    FROM resid)
       |  WHERE 2 * cum >= wtot GROUP BY 1)
       |SELECT n.g AS ship_yr, n.n_rows,
       |  round(mfit.m, 6) + 0.0 AS slope,
       |  round(bfit.b, 6) + 0.0 AS intercept
       |FROM (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_rows
       |      FROM cells GROUP BY 1) n
       |LEFT JOIN mfit ON n.g = mfit.g
       |LEFT JOIN bfit ON n.g = bfit.g""".stripMargin
}
