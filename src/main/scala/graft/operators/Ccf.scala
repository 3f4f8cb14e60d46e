package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Sample cross-correlation function (CCF) between two
  * regularly-sampled series on the same time buckets — the lead/lag
  * diagnostic: r_xy(k) = Σₜ(xₜ−x̄)(yₜ₊ₖ−ȳ) / √(Σ(xₜ−x̄)²·Σ(yₜ−ȳ)²)
  * for k = 0..K, means and variances over the FULL series (the
  * classical estimator, R `ccf` convention). A peak at k>0 means x
  * LEADS y by k buckets — the "which metric moves first" question
  * q111's ACF can't answer because it only sees one series.
  *
  * Exactness: both series are exact integers per bucket; clearing
  * denominators makes the numerator an exact integer —
  * numerator·n² = n²Pₖ − nS_y·Hₖ − nS_x·Tₖ + (n−k)·S_x·S_y with
  * Pₖ = Σxₜyₜ₊ₖ, Hₖ = Σxₜ over scored pairs, Tₖ = Σyₜ₊ₖ — and the
  * denominator the square root of a product of two exact integers
  * (n²Q − nS² per series). r_k is ONE shared-text expression
  * (double division of exactly-recovered integers and one
  * IEEE-correctly-rounded sqrt), so both engines agree bit-for-bit.
  *
  * Plan/scale: fact scan → time-bucket cells FIRST (calendar-bounded,
  * dimension-grade — the q111/q100 rationale for the global ordered
  * window), K leads of y from ONE window spec, then a single 1-row
  * aggregate unpivoted via stack. Row-grade data never meets the
  * window. */
object Ccf {

  /** CCF of x against y at lags 0..maxLag over a cell series (tCol
    * orderable bucket; xCol/yCol exact BIGINT values). Positive lag =
    * x leads y. Returns (lag, n_buckets, n_pairs, ccf). */
  def ccf(series: DataFrame, tCol: String, xCol: String, yCol: String,
      maxLag: Int): DataFrame = {
    val w = Window.orderBy(tCol)
    val withLeads = (1 to maxLag).foldLeft(
      series.select(col(tCol), col(xCol).as("x"), col(yCol).as("y"))) {
      case (d, k) => d.withColumn(s"y$k", lead(col("y"), k).over(w))
    }
    def yAt(k: Int): String = if (k == 0) "y" else s"y$k"
    val aggs = Seq(
      expr("CAST(count(1) AS DECIMAL(38,0))").as("n"),
      expr("CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("sx"),
      expr("CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("sy"),
      expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))")
        .as("qx"),
      expr("CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))")
        .as("qy")) ++
      (0 to maxLag).flatMap(k => Seq(
        expr(s"CAST(sum(CAST(x AS DECIMAL(38,0)) * ${yAt(k)})" +
          " AS DECIMAL(38,0))").as(s"p$k"),
        expr(s"CAST(sum(CASE WHEN ${yAt(k)} IS NOT NULL THEN" +
          s" CAST(x AS DECIMAL(38,0)) END) AS DECIMAL(38,0))").as(s"h$k"),
        expr(s"CAST(sum(CAST(${yAt(k)} AS DECIMAL(38,0)))" +
          " AS DECIMAL(38,0))").as(s"t$k")))
    val one = withLeads.agg(aggs.head, aggs.tail: _*)
    val stackArgs = (0 to maxLag)
      .map(k => s"$k, p$k, h$k, t$k").mkString(", ")
    one
      .selectExpr("n", "sx", "sy", "qx", "qy",
        s"stack(${maxLag + 1}, $stackArgs) AS (lag, p, h, tl)")
      .selectExpr("lag", "CAST(n AS BIGINT) AS n_buckets",
        "CAST(n - lag AS BIGINT) AS n_pairs",
        "round(CAST(n * n * p - n * sy * h - n * sx * tl" +
          " + (n - lag) * sx * sy AS DOUBLE)" +
          " / nullif(sqrt(CAST(n * n * qx - n * sx * sx AS DOUBLE)" +
          " * CAST(n * n * qy - n * sy * sy AS DOUBLE)), 0e0), 6)" +
          " + 0.0 AS ccf")
  }

  val MaxLag = 7

  /** q116: does daily order COUNT lead daily REVENUE? CCF at lags
    * 0–7 of the two cell series built in one scan of orders. */
  def dailyCountRevenueCcf(spark: SparkSession, dir: String): DataFrame =
    ccf(
      Tables.orders(spark, dir)
        .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
        .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(
          expr("CAST(count(1) AS BIGINT)").as("cnt"),
          expr("CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT))" +
            " AS BIGINT)").as("rev")),
      "day", "cnt", "rev", MaxLag)

  val dailyCountRevenueCcfSql: String = {
    val leads = (1 to MaxLag)
      .map(k => s"lead(y, $k) OVER (ORDER BY t) AS y$k").mkString(",\n      |    ")
    def yAt(k: Int): String = if (k == 0) "y" else s"y$k"
    val sums = (0 to MaxLag).map(k =>
      s"CAST(sum(CAST(x AS HUGEINT) * ${yAt(k)}) AS DECIMAL(38,0)) AS p$k,\n" +
        s"      |    CAST(sum(CASE WHEN ${yAt(k)} IS NOT NULL THEN CAST(x AS HUGEINT) END) AS DECIMAL(38,0)) AS h$k,\n" +
        s"      |    CAST(sum(CAST(${yAt(k)} AS HUGEINT)) AS DECIMAL(38,0)) AS t$k")
      .mkString(",\n      |    ")
    val unioned = (0 to MaxLag)
      .map(k => s"SELECT $k AS lag, n, sx, sy, qx, qy, p$k AS p, h$k AS h, t$k AS tl FROM agg")
      .mkString("\n      |  UNION ALL ")
    s"""WITH days AS (
       |  SELECT CAST(o_orderdate AS DATE) AS t,
       |    CAST(count(*) AS BIGINT) AS x,
       |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS y
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1),
       |leads AS (
       |  SELECT x, y,
       |    $leads
       |  FROM days),
       |agg AS (
       |  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
       |    CAST(sum(CAST(x AS HUGEINT)) AS DECIMAL(38,0)) AS sx,
       |    CAST(sum(CAST(y AS HUGEINT)) AS DECIMAL(38,0)) AS sy,
       |    CAST(sum(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS qx,
       |    CAST(sum(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS qy,
       |    $sums
       |  FROM leads),
       |stacked AS (
       |  $unioned)
       |SELECT lag, CAST(n AS BIGINT) AS n_buckets,
       |  CAST(n - lag AS BIGINT) AS n_pairs,
       |  round(CAST(n * n * p - n * sy * h - n * sx * tl
       |    + (n - lag) * sx * sy AS DOUBLE)
       |    / nullif(sqrt(CAST(n * n * qx - n * sx * sx AS DOUBLE)
       |    * CAST(n * n * qy - n * sy * sy AS DOUBLE)), 0e0), 6)
       |    + 0.0 AS ccf
       |FROM stacked""".stripMargin
  }
}
