package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Page–Hinkley drift statistic (retrospective form) — the classic
  * mean-shift EVIDENCE accumulator beside the deck's other
  * changepoint lenses: q105's CUSUM streams a z-scored alarm, q134
  * elects the single best split, q174's Pettitt ranks; Page–Hinkley
  * reads the maximal DRAWUP/DRAWDOWN of the centered partial-sum walk
  * — the magnitude a drift monitor thresholds (PH > λ ⇒ shift):
  *
  *   m_t = Σ_{u≤t}(x_u − x̄)
  *   PH⁺ = max_t (m_t − min_{u≤t} m_u)     (upward shift evidence)
  *   PH⁻ = max_t (max_{u≤t} m_u − m_t)     (downward)
  *
  * reported with the day each side peaks (earliest on ties) — the
  * actionable "when did the regime turn" output.
  *
  * Exactness: clearing x̄ = S/n makes the whole walk integral (the
  * q216 KPSS partial sums VERBATIM: m'_t = n·cum_t − t·S, exact
  * DECIMAL(38,0)); running extrema and the peak election are integer
  * max/min with the earliest-day tie-break decided by
  * max(struct(value, −t)) — no transcendental, no snap anywhere; the
  * single /n division is the one shared-text double. λ is the
  * caller's threshold; the registered query reports evidence, not a
  * fabricated alarm line (the q210 convention).
  *
  * Plan/scale: one corpus-touch daily aggregate → group-grade (n, S)
  * broadcast back → ONE ordered window pass per group (cumsum +
  * running extrema — the q115 calendar-cell class, audit-adjudicated)
  * → one keyed election aggregate → 1-row-per-group finish. */
object PageHinkley {

  /** PH per group from (g, t, x): group key, integer day, exact
    * BIGINT value. One row per group: (g, n_buckets, ph_up, up_day,
    * ph_down, down_day). */
  def pageHinkley(series: DataFrame): DataFrame = {
    val pts = series.select("g", "t", "x").localCheckpoint(true)
    val fit = pts.groupBy("g").agg(
      expr("CAST(count(1) AS BIGINT)").as("n_rows"),
      expr("CAST(sum(x) AS DECIMAL(38,0))").as("s_i"))
    val w = Window.partitionBy("g").orderBy("t")
    val wc = w.rowsBetween(Window.unboundedPreceding, 0)
    pts.join(broadcast(fit), "g")
      .withColumn("m", expr("CAST(n_rows AS DECIMAL(38,0))")
        * sum("x").over(wc) - row_number().over(w) * col("s_i"))
      .withColumn("runmin", min("m").over(wc))
      .withColumn("runmax", max("m").over(wc))
      .groupBy("g")
      .agg(
        expr("CAST(max(n_rows) AS BIGINT)").as("n_buckets"),
        expr("max(named_struct('v', m - runmin, 'nt', -t))").as("up"),
        expr("max(named_struct('v', runmax - m, 'nt', -t))").as("dn"))
      .selectExpr("g", "n_buckets",
        "round(CAST(up.v AS DOUBLE) / CAST(n_buckets AS DOUBLE), 4)" +
          " + 0.0 AS ph_up",
        "CAST(-up.nt AS BIGINT) AS up_day",
        "round(CAST(dn.v AS DOUBLE) / CAST(n_buckets AS DOUBLE), 4)" +
          " + 0.0 AS ph_down",
        "CAST(-dn.nt AS BIGINT) AS down_day")
  }

  /** q226: where does the evidence for a revenue regime turn peak,
    * per priority — the drawup/drawdown read on the q216 partial-sum
    * walk (dollar units, the q216 bound note). */
  def dailyRevenuePh(spark: SparkSession, dir: String): DataFrame =
    pageHinkley(Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS t",
        "CAST(floor(o_totalprice) AS BIGINT) AS usd")
      .groupBy("g", "t")
      .agg(expr("CAST(sum(usd) AS BIGINT)").as("x")))
      .withColumnRenamed("g", "o_orderpriority")

  /** The PH walk as reusable CTE text over a `$src(g, t, x)` series
    * CTE — shared by the q226 oracle and the q261 sketch-drift oracle
    * (same integer walk, different series and output naming). */
  def phWalkSql(src: String, keyAs: String,
      upDay: String = "up_day", downDay: String = "down_day"): String =
    s"""fit AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS s_i
       |  FROM $src GROUP BY 1),
       |walked AS (
       |  SELECT d.g, n_rows, t,
       |    CAST(n_rows AS HUGEINT)
       |      * CAST(sum(x) OVER (PARTITION BY d.g ORDER BY t
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
       |      - CAST(row_number() OVER (PARTITION BY d.g ORDER BY t)
       |          AS HUGEINT) * s_i AS m
       |  FROM $src d JOIN fit ON d.g = fit.g),
       |extrema AS (
       |  SELECT g, n_rows, t, m,
       |    min(m) OVER (PARTITION BY g ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin,
       |    max(m) OVER (PARTITION BY g ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
       |  FROM walked),
       |ranked AS (
       |  SELECT g, n_rows, t, m - runmin AS uv, runmax - m AS dv,
       |    row_number() OVER (PARTITION BY g
       |      ORDER BY m - runmin DESC, t ASC) AS urk,
       |    row_number() OVER (PARTITION BY g
       |      ORDER BY runmax - m DESC, t ASC) AS drk
       |  FROM extrema),
       |up AS (
       |  SELECT g, CAST(max(n_rows) AS BIGINT) AS n_buckets,
       |    max(CASE WHEN urk = 1 THEN uv END) AS uv,
       |    CAST(max(CASE WHEN urk = 1 THEN t END) AS BIGINT) AS $upDay,
       |    max(CASE WHEN drk = 1 THEN dv END) AS dv,
       |    CAST(max(CASE WHEN drk = 1 THEN t END) AS BIGINT) AS $downDay
       |  FROM ranked GROUP BY g)
       |SELECT g AS $keyAs, n_buckets,
       |  round(CAST(uv AS DOUBLE) / CAST(n_buckets AS DOUBLE), 4)
       |    + 0.0 AS ph_up,
       |  $upDay,
       |  round(CAST(dv AS DOUBLE) / CAST(n_buckets AS DOUBLE), 4)
       |    + 0.0 AS ph_down,
       |  $downDay
       |FROM up""".stripMargin

  /** DuckDB twin: identical integer walk; the struct election is
    * mirrored as (ORDER BY v DESC, t ASC LIMIT per-group 1) pivots. */
  val dailyRevenuePhSql: String =
    s"""WITH daily AS (
       |  SELECT o_orderpriority AS g,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS t,
       |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS x
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1, 2),
       |${phWalkSql("daily", "o_orderpriority")}""".stripMargin

}
