package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Generalized-Pareto peaks-over-threshold — the third leg of the
  * extreme-value deck: q188's Hill gives the tail EXPONENT, q199's
  * Gumbel reads BLOCK maxima; POT models every exceedance over a high
  * threshold directly (the estimator that uses all tail data, the
  * standard for "what loss is exceeded once in 10⁴ observations").
  * Method-of-moments GPD fit on the excesses y = x − u:
  *
  *   ξ̂ = ½(1 − ȳ²/s²),  σ̂ = ½ȳ(ȳ²/s² + 1)
  *   x_p = u + (σ̂/ξ̂)·((λ/p)^ξ̂ − 1),  λ = k/n  (return level at
  *   exceedance probability p)
  *
  * Threshold u = the (k+1)-th largest value with k = max(n div 20,
  * 30) — the top-5% order statistic read EXACTLY from value cells
  * with the q188 boundary split (a straddling cell contributes
  * exactly its share; ties at u contribute zero excesses — the
  * documented convention, identical in both engines).
  *
  * Exactness: the tail selection and the excess sums Σm·y, Σm·y² are
  * exact BIGINT/DECIMAL(38,0); ȳ/s²/ξ/σ are ONE shared-text rational
  * chain; only the power re-enters libm — ln and exp are snapped to
  * the 1e-9 grid (the q199 nested-transcendental lesson).
  *
  * Plan/scale: one corpus-touch cell aggregate → a descending
  * [[BandedCumsum]] walk (revenue cells are near-unique — the q188
  * adjudication, absolute per-task cap) → a dimension-grade threshold
  * lookup broadcast back → one keyed finish. */
object GpdPot {

  /** ln(λ/p) snapped to nano-nats, then ξ·ln and the exp snapped
    * again — shared text (p a literal). */
  private def powSql(p: String): String = {
    val lnl = "(CAST(floor(ln(CAST(kt AS DOUBLE) / CAST(n_rows AS DOUBLE)" +
      s" / $p) * 1e9 + 5e-1) AS DOUBLE) / 1e9)"
    s"(CAST(floor(exp(xi * $lnl) * 1e9 + 5e-1) AS DOUBLE) / 1e9)"
  }

  /** Return level at exceedance probability p, in cents (shared
    * text; NULL when ξ = 0 or the fit is degenerate). */
  private def rlSql(p: String): String =
    s"(CAST(u AS DOUBLE) + sigma / nullif(xi, 0.0) * (${powSql(p)} - 1.0))"

  private val YbarSql = "(CAST(sy AS DOUBLE) / CAST(kt AS DOUBLE))"
  private val S2Sql =
    "((CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)" +
      " / CAST(kt AS DOUBLE)) / (CAST(kt AS DOUBLE) - 1.0))"
  private val RSql = s"($YbarSql * $YbarSql / nullif($S2Sql, 0.0))"
  private val XiSql = s"(5e-1 * (1.0 - $RSql))"
  private val SigmaSql = s"(5e-1 * $YbarSql * ($RSql + 1.0))"

  /** GPD-POT fit per group from a frame with (g, x): positive BIGINT
    * values. One row per group: (g, n_rows, k_tail, u, xi, sigma,
    * rl_p3, rl_p4) — σ/levels in x's own units; NULLs when the tail
    * is degenerate (constant excesses or ξ = 0). */
  def gpdPot(values: DataFrame): DataFrame = {
    val cells = values.filter(col("x") > 0)
      .groupBy("g", "x")
      .agg(expr("CAST(count(1) AS BIGINT)").as("cnt"))
      .localCheckpoint(true) // banded walk + totals both read it
    val totals = cells.groupBy("g")
      .agg(expr("CAST(sum(cnt) AS BIGINT)").as("n_rows"))
    val walked = BandedCumsum.cumsum(cells.withColumn("negx", -col("x")),
        Seq("g"), "negx", Seq("cnt"), inputCheckpointed = true)
      .withColumn("cum_above", col("cum_cnt") - col("cnt"))
      .drop("negx", "cum_cnt")
      .join(broadcast(totals), "g")
      .withColumn("kt", expr("greatest(n_rows div 20, 30L)"))
      .localCheckpoint(true) // threshold lookup + tail sums read it
    // u = the (k+1)-th largest value: the cell covering position k+1
    val thresh = walked
      .groupBy("g")
      .agg(expr("CAST(min(CASE WHEN cum_above <= kt" +
        " AND cum_above + cnt >= kt + 1 THEN x END) AS BIGINT)").as("u"))
    walked
      .filter(col("cum_above") < col("kt"))
      .join(broadcast(thresh), "g")
      .withColumn("m", expr("least(cnt, kt - cum_above)"))
      .withColumn("y", expr("x - u"))
      .groupBy("g")
      .agg(
        expr("CAST(max(n_rows) AS BIGINT)").as("n_rows"),
        expr("CAST(max(kt) AS BIGINT)").as("kt"),
        expr("CAST(max(u) AS BIGINT)").as("u"),
        expr("CAST(sum(m * y) AS BIGINT)").as("sy"),
        expr("CAST(sum(CAST(m AS DECIMAL(38,0)) * y * y) AS DECIMAL(38,0))")
          .as("sy2"))
      .selectExpr("g", "n_rows", "kt", "u",
        s"round($XiSql, 6) + 0.0 AS xi",
        s"round($SigmaSql, 4) + 0.0 AS sigma")
      .selectExpr("g", "n_rows", "kt AS k_tail", "u", "xi", "sigma",
        s"round(${rlSql("1e-3")}, 2) + 0.0 AS rl_p3",
        s"round(${rlSql("1e-4")}, 2) + 0.0 AS rl_p4")
  }

  /** q202: what order value does each priority class exceed once in
    * 10³ / 10⁴ orders — the POT answer on exact cent values, beside
    * q188's exponent and q199's calendar-block view. */
  def orderValuePot(spark: SparkSession, dir: String): DataFrame =
    gpdPot(Tables.orders(spark, dir)
      .filter(col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "CAST(floor(o_totalprice * 1e2) AS BIGINT) AS x"))
      .withColumnRenamed("g", "o_orderpriority")

  /** DuckDB twin: identical cells, walk, boundary split, MoM chain,
    * snapped power. */
  val orderValuePotSql: String =
    s"""WITH cells AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(floor(o_totalprice * 1e2) AS BIGINT) AS x,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM orders
       |  WHERE o_totalprice IS NOT NULL
       |    AND CAST(floor(o_totalprice * 1e2) AS BIGINT) > 0
       |  GROUP BY 1, 2),
       |walked AS (
       |  SELECT *,
       |    coalesce(CAST(sum(cnt) OVER (PARTITION BY g ORDER BY x DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      0) AS cum_above,
       |    CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n_rows
       |  FROM cells),
       |marked AS (
       |  SELECT *, greatest(n_rows // 20, 30) AS kt FROM walked),
       |thresh AS (
       |  SELECT g, CAST(min(CASE WHEN cum_above <= kt
       |    AND cum_above + cnt >= kt + 1 THEN x END) AS BIGINT) AS u
       |  FROM marked GROUP BY 1),
       |tail_sums AS (
       |  SELECT g,
       |    CAST(max(n_rows) AS BIGINT) AS n_rows,
       |    CAST(max(kt) AS BIGINT) AS kt,
       |    CAST(max(u) AS BIGINT) AS u,
       |    CAST(sum(least(cnt, kt - cum_above) * (x - u)) AS BIGINT) AS sy,
       |    CAST(sum(CAST(least(cnt, kt - cum_above) AS HUGEINT)
       |      * (x - u) * (x - u)) AS HUGEINT) AS sy2
       |  FROM marked JOIN thresh USING (g)
       |  WHERE cum_above < kt GROUP BY 1),
       |fit AS (
       |  SELECT g, n_rows, kt AS k_tail, u, kt, sy, sy2,
       |    round($XiSql, 6) + 0.0 AS xi,
       |    round($SigmaSql, 4) + 0.0 AS sigma
       |  FROM tail_sums)
       |SELECT g AS o_orderpriority, n_rows, k_tail, u, xi, sigma,
       |  round(${rlSql("1e-3")}, 2) + 0.0 AS rl_p3,
       |  round(${rlSql("1e-4")}, 2) + 0.0 AS rl_p4
       |FROM fit""".stripMargin
}
