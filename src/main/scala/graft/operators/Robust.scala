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
}
