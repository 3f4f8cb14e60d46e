package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** KPSS level-stationarity test (Kwiatkowski–Phillips–Schmidt–Shin
  * 1992) — the COMPLEMENT of q210's Dickey–Fuller: ADF's null is a
  * unit root (failing to reject ≠ stationary), KPSS's null is
  * stationarity, so running BOTH is the standard adjudication — agree
  * and you know; disagree and the series is the ambiguous middle.
  *
  *   η = Σ_t S_t² / (n²·σ̂²_lr),  S_t = Σ_{u≤t}(x_u − x̄)
  *   σ̂²_lr = γ̂₀ + 2·Σ_{l=1..q} (1 − l/(q+1))·γ̂_l   (Bartlett)
  *
  * Exactness: clearing x̄ = S/n makes EVERYTHING integral — residuals
  * e'ₜ = n·xₜ − S, partial sums S'ₜ = n·cumₜ − t·S, autocovariance
  * sums γ'_l = Σ e'ₜe'ₜ₋l are all exact DECIMAL(38,0); multiplying
  * the Bartlett weights through by (q+1) keeps the long-run kernel
  * integral too: D = (q+1)·γ'₀ + 2·Σ(q+1−l)·γ'_l, and
  *
  *   η = (q+1)·ΣS'² / (n·D)
  *
  * is ONE shared-text division of exactly-recovered doubles — nothing
  * is snapped, nothing transcendental. (Bounds: dollar-unit day cells
  * keep ΣS'² ~ n³·Σx² ≲ 10³⁰ ≪ 10³⁸ at the registered spans; the
  * Bartlett kernel is PSD so D ≥ 0, D = 0 → NULL.) The null line is
  * documented, not fabricated (q210 convention): reject level
  * stationarity at α = 0.05 when η > 0.463.
  *
  * Plan/scale: one corpus-touch daily aggregate → group-grade (n, S)
  * fit joined back BROADCAST → ONE ordered window pass per group over
  * the day spine (cumulative + q lags — the q115 calendar-cell class,
  * bounded by the date span) → one keyed aggregate → 1-row-per-group
  * finish. */
object Kpss {

  /** KPSS η per group from a frame with (g, t, x): group key,
    * orderable bucket, exact BIGINT value. `lags` = q (Bartlett
    * bandwidth). One row per group: (g, n_buckets, lags, eta) — NULL
    * when n < 2 or the series is constant (D = 0). */
  def kpss(series: DataFrame, lags: Int): DataFrame = {
    require(lags >= 0, s"lags must be >= 0, got $lags")
    val pts = series.select("g", "t", "x").localCheckpoint(true)
    val fit = pts.groupBy("g").agg(
      expr("CAST(count(1) AS BIGINT)").as("n_rows"),
      expr("CAST(sum(x) AS DECIMAL(38,0))").as("s_i"))
    val w = Window.partitionBy("g").orderBy("t")
    val wc = w.rowsBetween(Window.unboundedPreceding, 0)
    val withE = pts.join(broadcast(fit), "g")
      .withColumn("e", expr("CAST(n_rows AS DECIMAL(38,0)) * x - s_i"))
      .withColumn("sp", expr("CAST(n_rows AS DECIMAL(38,0))")
        * sum("x").over(wc) - row_number().over(w) * col("s_i"))
    val withLags = (1 to lags).foldLeft(withE) {
      case (d, l) => d.withColumn(s"e$l", lag("e", l).over(w))
    }
    val gammas = (1 to lags).map(l =>
      expr(s"CAST(sum(e * e$l) AS DECIMAL(38,0))").as(s"g$l"))
    val kernel = (Seq(s"${lags + 1} * g0") ++
      (1 to lags).map(l => s"2 * ${lags + 1 - l} * g$l")).mkString(" + ")
    val aggs = Seq(
      expr("CAST(sum(sp * sp) AS DECIMAL(38,0))").as("ss2"),
      expr("CAST(sum(e * e) AS DECIMAL(38,0))").as("g0")) ++ gammas
    withLags.groupBy("g")
      .agg(expr("CAST(max(n_rows) AS BIGINT)").as("n_buckets"), aggs: _*)
      .selectExpr("g", "n_buckets",
        s"CAST(${lags} AS INT) AS lags",
        s"CASE WHEN n_buckets >= 2 AND ($kernel) > 0 THEN" +
          s" round(${lags + 1} * CAST(ss2 AS DOUBLE)" +
          s" / (CAST(n_buckets AS DOUBLE) * CAST($kernel AS DOUBLE)), 6)" +
          s" + 0.0 END AS eta")
  }

  /** Registered Bartlett bandwidth: the ACTUAL Schwert short rule at
    * the registered span — q = ⌊4·(n/100)^0.25⌋ = 8 at n ≈ 2400 daily
    * buckets (r13 ADVICE: the previous literal 4 understated the rule
    * it cited, and an under-sized bandwidth inflates eta under
    * positive autocorrelation). Fixed as a literal — not computed from
    * n at runtime — so both engines share the exact kernel text and
    * the statistic stays deterministic across data refreshes. */
  val Lags = 8

  /** q216: is daily order revenue level-stationary, per priority —
    * the q210 ADF frame under the reversed null; the PAIR of verdicts
    * is the actionable read (both reject → the ambiguous middle;
    * dollar units keep the integer bounds documented above). */
  def dailyRevenueKpss(spark: SparkSession, dir: String): DataFrame =
    kpss(Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS t",
        "CAST(floor(o_totalprice) AS BIGINT) AS usd")
      .groupBy("g", "t")
      .agg(expr("CAST(sum(usd) AS BIGINT)").as("x")), Lags)
      .withColumnRenamed("g", "o_orderpriority")

  /** DuckDB twin: identical cleared integers, Bartlett kernel, and
    * final chain. */
  val dailyRevenueKpssSql: String = {
    val lagCols = (1 to Lags)
      .map(l => s"lag(e, $l) OVER (PARTITION BY g ORDER BY t) AS e$l")
      .mkString(",\n       |    ")
    val gammaSums = (1 to Lags)
      .map(l => s"CAST(sum(e * e$l) AS HUGEINT) AS g$l")
      .mkString(",\n       |    ")
    val kernel = (Seq(s"${Lags + 1} * g0") ++
      (1 to Lags).map(l => s"2 * ${Lags + 1 - l} * g$l")).mkString(" + ")
    s"""WITH daily AS (
       |  SELECT o_orderpriority AS g,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS t,
       |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS x
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1, 2),
       |fit AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS s_i
       |  FROM daily GROUP BY 1),
       |walked AS (
       |  SELECT d.g, n_rows,
       |    CAST(n_rows AS HUGEINT) * x - s_i AS e,
       |    CAST(n_rows AS HUGEINT)
       |      * CAST(sum(x) OVER (PARTITION BY d.g ORDER BY t
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
       |      - CAST(row_number() OVER (PARTITION BY d.g ORDER BY t)
       |          AS HUGEINT) * s_i AS sp,
       |    t
       |  FROM daily d JOIN fit ON d.g = fit.g),
       |lagged AS (
       |  SELECT g, n_rows, e, sp,
       |    $lagCols
       |  FROM walked),
       |agg AS (
       |  SELECT g,
       |    CAST(max(n_rows) AS BIGINT) AS n_buckets,
       |    CAST(sum(sp * sp) AS HUGEINT) AS ss2,
       |    CAST(sum(e * e) AS HUGEINT) AS g0,
       |    $gammaSums
       |  FROM lagged GROUP BY 1)
       |SELECT g AS o_orderpriority, n_buckets,
       |  CAST($Lags AS INT) AS lags,
       |  CASE WHEN n_buckets >= 2 AND ($kernel) > 0 THEN
       |    round(${Lags + 1} * CAST(ss2 AS DOUBLE)
       |    / (CAST(n_buckets AS DOUBLE) * CAST($kernel AS DOUBLE)), 6)
       |    + 0.0 END AS eta
       |FROM agg""".stripMargin
  }
}
