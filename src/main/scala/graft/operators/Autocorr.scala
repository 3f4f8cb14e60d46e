package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Sample autocorrelation function (ACF) of a regularly-sampled
  * series — r_k = Σ(xₜ−x̄)(xₜ₊ₖ−x̄) / Σ(xₜ−x̄)² for lags 1..K, the
  * time-series diagnostic behind "is there weekly seasonality /
  * momentum in this metric" (a lag-7 spike on a daily series IS the
  * weekly cycle). Complements q105's CUSUM (is the level shifting)
  * with structure-in-time.
  *
  * Exactness: the series is integer cents per bucket (per-row floor,
  * BIGINT sum); clearing denominators turns both sides into exact
  * integers — numerator·n² = n²Pₖ − nS(Hₖ+Tₖ) + (n−k)S² and
  * denominator·n² = n²Q − nS² with Pₖ = Σxₜxₜ₊ₖ, Hₖ/Tₖ the head/tail
  * sums, S = Σx, Q = Σx² (all decimal-first) — so r_k is ONE
  * shared-text division of exactly-recovered doubles. No mean is ever
  * materialized as a double.
  *
  * Plan/scale: the fact table collapses to TIME-BUCKET cells in one
  * keyed aggregate (days here — calendar-bounded, dimension-grade);
  * the K lead columns come from ONE ordered window over those cells,
  * and everything reduces to a single 1-row aggregate unpivoted to K
  * rows. The global window is legitimate for the same reason q100's
  * is: a calendar of buckets is dimension-grade by construction —
  * row-grade data never meets the window. */
object Autocorr {

  /** ACF at lags 1..maxLag of a cell series (tCol orderable bucket,
    * xCol exact BIGINT value). Returns (lag, n_buckets, n_pairs,
    * acf). */
  def acf(series: DataFrame, tCol: String, xCol: String,
      maxLag: Int): DataFrame = {
    val w = Window.orderBy(tCol)
    val withLeads = (1 to maxLag).foldLeft(
      series.select(col(tCol), col(xCol).as("x"))) {
      case (d, k) => d.withColumn(s"x$k", lead(col("x"), k).over(w))
    }
    val aggs = Seq(
      expr("CAST(count(1) AS DECIMAL(38,0))").as("n"),
      expr("CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("s"),
      expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))")
        .as("q")) ++
      (1 to maxLag).flatMap(k => Seq(
        expr(s"CAST(sum(CAST(x AS DECIMAL(38,0)) * x$k) AS DECIMAL(38,0))")
          .as(s"p$k"),
        expr(s"CAST(sum(CASE WHEN x$k IS NOT NULL THEN" +
          s" CAST(x AS DECIMAL(38,0)) END) AS DECIMAL(38,0))").as(s"h$k"),
        expr(s"CAST(sum(CAST(x$k AS DECIMAL(38,0))) AS DECIMAL(38,0))")
          .as(s"t$k")))
    val one = withLeads.agg(aggs.head, aggs.tail: _*)
    val stackArgs = (1 to maxLag)
      .map(k => s"$k, p$k, h$k, t$k").mkString(", ")
    one
      .selectExpr("n", "s", "q",
        s"stack($maxLag, $stackArgs) AS (lag, p, h, tl)")
      .selectExpr("lag", "CAST(n AS BIGINT) AS n_buckets",
        "CAST(n - lag AS BIGINT) AS n_pairs",
        "round(CAST(n * n * p - n * s * (h + tl) + (n - lag) * s * s" +
          " AS DOUBLE) / nullif(CAST(n * n * q - n * s * s AS DOUBLE)," +
          " 0e0), 6) + 0.0 AS acf")
  }

  val MaxLag = 7

  /** q111: autocorrelation of DAILY order revenue at lags 1–7 — does
    * today's revenue predict tomorrow's / next week's? */
  def dailyRevenueAcf(spark: SparkSession, dir: String): DataFrame =
    acf(
      Tables.orders(spark, dir)
        .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
        .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(expr("CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT))" +
          " AS BIGINT)").as("rev")),
      "day", "rev", MaxLag)

  val dailyRevenueAcfSql: String = {
    val leads = (1 to MaxLag)
      .map(k => s"lead(x, $k) OVER (ORDER BY t) AS x$k").mkString(",\n      |    ")
    val sums = (1 to MaxLag).map(k =>
      s"CAST(sum(CAST(x AS HUGEINT) * x$k) AS DECIMAL(38,0)) AS p$k,\n" +
        s"      |    CAST(sum(CASE WHEN x$k IS NOT NULL THEN CAST(x AS HUGEINT) END) AS DECIMAL(38,0)) AS h$k,\n" +
        s"      |    CAST(sum(CAST(x$k AS HUGEINT)) AS DECIMAL(38,0)) AS t$k")
      .mkString(",\n      |    ")
    val unioned = (1 to MaxLag)
      .map(k => s"SELECT $k AS lag, n, s, q, p$k AS p, h$k AS h, t$k AS tl FROM agg")
      .mkString("\n      |  UNION ALL ")
    s"""WITH days AS (
       |  SELECT CAST(o_orderdate AS DATE) AS t,
       |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS x
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1),
       |leads AS (
       |  SELECT x,
       |    $leads
       |  FROM days),
       |agg AS (
       |  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
       |    CAST(sum(CAST(x AS HUGEINT)) AS DECIMAL(38,0)) AS s,
       |    CAST(sum(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS q,
       |    $sums
       |  FROM leads),
       |stacked AS (
       |  $unioned)
       |SELECT lag, CAST(n AS BIGINT) AS n_buckets,
       |  CAST(n - lag AS BIGINT) AS n_pairs,
       |  round(CAST(n * n * p - n * s * (h + tl) + (n - lag) * s * s
       |    AS DOUBLE) / nullif(CAST(n * n * q - n * s * s AS DOUBLE),
       |    0e0), 6) + 0.0 AS acf
       |FROM stacked""".stripMargin
  }
}
