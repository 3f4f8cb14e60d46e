package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Grubbs' maximum-studentized-deviation test — the SINGLE-outlier
  * question the robust deck poses but never answers head-on: q71's
  * MAD flags every point beyond a robust band, q105/q134 find level
  * SHIFTS, but "is the one most extreme day real signal or a data
  * fault?" is Grubbs:
  *
  *   G = max_i |x_i − x̄| / s
  *
  * The operator elects the most-deviant observation per group and
  * reports G with the elected row, leaving the accept/reject line to
  * the caller: the exact critical value needs the Student-t quantile
  * at α/(2n) (a lookup, not an engine primitive), so — the q210
  * convention — we report the statistic and document the anchor:
  * at n = 2400, G beyond ≈ 4.07 rejects at α = 0.05 (two-sided).
  *
  * Exactness: the ELECTION is decided on exact integers — the
  * deviation is ranked as |n·x_i − Σx| (cleared denominator: x in
  * cents, both factors exact DECIMAL(38,0)), ties broken on the
  * earliest key — so the elected row is deterministic and identical
  * in both engines with NO transcendental in the ranking. G itself is
  * then one shared-text chain on exact-integer casts (sqrt correctly
  * rounded on bit-identical operands — the q134 rule), snapped round-4.
  *
  * Plan/scale: the registered series is the q209 day-cell frame (one
  * corpus-touch daily aggregate); moment sums are one keyed aggregate
  * joined back BROADCAST (group-grade); the election window is
  * partitioned per group over the day spine — the q115 calendar-cell
  * class, bounded by the date span, never by fact rows. */
object Grubbs {

  private val VarSql = "((nd * sxx - sx * sx) / (nd * (nd - 1.0)))"
  private val GSql =
    s"((CAST(dev AS DOUBLE) / nd) / sqrt($VarSql))"

  /** Grubbs election per group from a frame with (g, t, x): group
    * key, BIGINT observation key (tie-break: smallest wins), BIGINT
    * value. One row per group: (g, n_rows, t_out, x_out, mean_x,
    * g_stat) — g_stat NULL when n < 3 or the group is constant. */
  def grubbs(rows: DataFrame): DataFrame = {
    val pts = rows.select("g", "t", "x").localCheckpoint(true)
    val fit = pts.groupBy("g").agg(
      expr("CAST(count(1) AS BIGINT)").as("n_rows"),
      expr("CAST(sum(x) AS DECIMAL(38,0))").as("sx_i"),
      expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))")
        .as("sxx_i"))
    val w = Window.partitionBy("g")
      .orderBy(col("dev").desc, col("t").asc)
    pts.join(broadcast(fit), "g")
      .withColumn("dev",
        expr("abs(CAST(n_rows AS DECIMAL(38,0)) * x - sx_i)"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .selectExpr("g", "n_rows", "t AS t_out", "x AS x_out",
        "CAST(n_rows AS DOUBLE) AS nd",
        "CAST(sx_i AS DOUBLE) AS sx", "CAST(sxx_i AS DOUBLE) AS sxx", "dev")
      .selectExpr("g", "n_rows", "t_out", "x_out",
        "round(sx / nd, 4) + 0.0 AS mean_x",
        s"CASE WHEN n_rows >= 3 AND $VarSql > 0.0 THEN" +
          s" round($GSql, 4) + 0.0 END AS g_stat")
  }

  /** q214: which single day's revenue is most anomalous, per order
    * priority — the q209/q210 day-cell series under the one-outlier
    * lens (a fat-fingered load or a genuine demand spike both land
    * here first; the day itself is the actionable output). */
  def dailyRevenueGrubbs(spark: SparkSession, dir: String): DataFrame =
    grubbs(Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS t",
        "CAST(floor(o_totalprice * 1e2) AS BIGINT) AS cents")
      .groupBy("g", "t")
      .agg(expr("CAST(sum(cents) AS BIGINT)").as("x")))
      .selectExpr("g AS o_orderpriority", "n_rows",
        "date_add(DATE'1970-01-01', CAST(t_out AS INT)) AS out_day",
        "x_out AS out_cents", "mean_x AS mean_cents", "g_stat")

  /** DuckDB twin: identical integer election and shared G chain. */
  val dailyRevenueGrubbsSql: String =
    s"""WITH daily AS (
       |  SELECT o_orderpriority AS g,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS t,
       |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS x
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1, 2),
       |fit AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx_i,
       |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx_i
       |  FROM daily GROUP BY 1),
       |dev AS (
       |  SELECT d.g, n_rows, t, x,
       |    abs(CAST(n_rows AS HUGEINT) * x - sx_i) AS dev,
       |    sx_i, sxx_i,
       |    row_number() OVER (PARTITION BY d.g
       |      ORDER BY abs(CAST(n_rows AS HUGEINT) * x - sx_i) DESC, t ASC) AS rk
       |  FROM daily d JOIN fit ON d.g = fit.g),
       |top1 AS (
       |  SELECT g, n_rows, t AS t_out, x AS x_out,
       |    CAST(n_rows AS DOUBLE) AS nd,
       |    CAST(sx_i AS DOUBLE) AS sx, CAST(sxx_i AS DOUBLE) AS sxx, dev
       |  FROM dev WHERE rk = 1)
       |SELECT g AS o_orderpriority, n_rows,
       |  DATE '1970-01-01' + CAST(t_out AS INT) AS out_day,
       |  x_out AS out_cents,
       |  round(sx / nd, 4) + 0.0 AS mean_cents,
       |  CASE WHEN n_rows >= 3 AND $VarSql > 0.0 THEN
       |    round($GSql, 4) + 0.0 END AS g_stat
       |FROM top1""".stripMargin
}
