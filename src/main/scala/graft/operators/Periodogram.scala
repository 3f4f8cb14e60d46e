package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Fixed-period periodogram — the FREQUENCY-domain lens on the
  * seasonality questions q127/q139 answer in the time domain: those
  * read day-of-week cell means; the periodogram reads what fraction
  * of the series' variance concentrates at a candidate period p,
  *
  *   frac(p) = 2·(C² + S²) / (n·Σ(x−x̄)²)
  *   C = Σ(xₜ−x̄)·cos(2πtₚ/p), S = Σ(xₜ−x̄)·sin(2πtₚ/p), tₚ = t mod p
  *
  * — 1.0 for a pure sinusoid at p, ~2/n for white noise (the
  * documented null level), and it works for ANY candidate period,
  * not just the dow grid.
  *
  * Exactness: the mean is cleared (e'ₜ = n·xₜ − S exact
  * DECIMAL(38,0), the q216 move); cos/sin take only p distinct
  * arguments (t mod p) and each output is snapped to the 1e-9
  * nano grid (the q94/q110 transcendental convention) and carried as
  * an INTEGER — so C'/S' are exact integer sums and frac is ONE
  * shared-text chain: 2·(C'² + S'²)/(1e18·n·Σe'²) with the 1e9 snap
  * scale cleared explicitly. Constant series → NULL.
  *
  * Plan/scale: one corpus-touch daily aggregate → group-grade (n, S)
  * broadcast back → one keyed aggregate per period (the period list
  * is a literal — terms ride the SAME projection, one pass for all
  * periods) → a stack to (g, period) rows. NO windows at all — the
  * phase needs only t mod p, not an ordering. */
object Periodogram {

  /** registered candidate periods (days): week + pseudo-month */
  val Periods: Seq[Int] = Seq(7, 30)

  private def cosN(p: Int): String =
    s"CAST(floor(cos(2 * pi() * (t % $p) / $p) * 1e9 + 5e-1) AS BIGINT)"
  private def sinN(p: Int): String =
    s"CAST(floor(sin(2 * pi() * (t % $p) / $p) * 1e9 + 5e-1) AS BIGINT)"

  private val FracSql =
    "(2.0 * (CAST(cc AS DOUBLE) * CAST(cc AS DOUBLE)" +
      " + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))" +
      " / (1e18 * CAST(n_buckets AS DOUBLE) * CAST(g0 AS DOUBLE)))"

  /** Variance fraction at each period from (g, t, x): group, integer
    * day, exact BIGINT value. Rows: (g, period, n_buckets,
    * power_frac). */
  def periodogram(series: DataFrame, periods: Seq[Int] = Periods): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 2), "periods must be >= 2")
    val pts = series.select("g", "t", "x").localCheckpoint(true)
    val fit = pts.groupBy("g").agg(
      expr("CAST(count(1) AS BIGINT)").as("n_rows"),
      expr("CAST(sum(x) AS DECIMAL(38,0))").as("s_i"))
    val aggs = Seq(
      expr("CAST(max(n_rows) AS BIGINT)").as("n_buckets"),
      expr("CAST(sum(e * e) AS DECIMAL(38,0))").as("g0")) ++
      periods.flatMap(p => Seq(
        expr(s"CAST(sum(e * ${cosN(p)}) AS DECIMAL(38,0))").as(s"c$p"),
        expr(s"CAST(sum(e * ${sinN(p)}) AS DECIMAL(38,0))").as(s"s$p")))
    val stackArgs = periods.map(p => s"$p, c$p, s$p").mkString(", ")
    pts.join(broadcast(fit), "g")
      .withColumn("e", expr("CAST(n_rows AS DECIMAL(38,0)) * x - s_i"))
      .groupBy("g")
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr("g", "n_buckets", "g0",
        s"stack(${periods.size}, $stackArgs) AS (period, cc, ss)")
      .selectExpr("g", "period", "n_buckets",
        s"CASE WHEN g0 > 0 THEN round($FracSql, 6) + 0.0 END AS power_frac")
  }

  /** q228: what fraction of daily-revenue variance beats at the week
    * and the 30-day cycle, per priority — the spectral read beside
    * q127's dow cells (a frac ≫ 2/n at p = 7 IS the weekly cycle). */
  def dailyRevenuePeriodogram(spark: SparkSession, dir: String): DataFrame =
    periodogram(Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS t",
        "CAST(floor(o_totalprice) AS BIGINT) AS usd")
      .groupBy("g", "t")
      .agg(expr("CAST(sum(usd) AS BIGINT)").as("x")))
      .withColumnRenamed("g", "o_orderpriority")

  /** DuckDB twin: identical snapped trig integers and shared chain. */
  val dailyRevenuePeriodogramSql: String = {
    val sums = Periods.flatMap(p => Seq(
      s"CAST(sum(e * ${cosN(p)}) AS HUGEINT) AS c$p",
      s"CAST(sum(e * ${sinN(p)}) AS HUGEINT) AS s$p"))
      .mkString(",\n       |    ")
    val unioned = Periods.map(p =>
      s"SELECT g, n_buckets, g0, $p AS period, c$p AS cc, s$p AS ss FROM agg")
      .mkString("\n       |  UNION ALL ")
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
       |  SELECT d.g, n_rows, t,
       |    CAST(n_rows AS HUGEINT) * x - s_i AS e
       |  FROM daily d JOIN fit ON d.g = fit.g),
       |agg AS (
       |  SELECT g,
       |    CAST(max(n_rows) AS BIGINT) AS n_buckets,
       |    CAST(sum(e * e) AS HUGEINT) AS g0,
       |    $sums
       |  FROM walked GROUP BY 1),
       |stacked AS (
       |  $unioned)
       |SELECT g AS o_orderpriority, period, n_buckets,
       |  CASE WHEN g0 > 0 THEN round($FracSql, 6) + 0.0 END AS power_frac
       |FROM stacked""".stripMargin
  }
}
