package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Durbin–Watson serial-correlation diagnostic — the trust check on
  * every OLS trend fit in the deck (q32/q115/q207): those queries
  * report slope t-stats whose SEs assume INDEPENDENT errors; on a
  * time-ordered series that assumption is usually the first thing to
  * fail, and positive residual autocorrelation silently shrinks the
  * reported SEs. DW answers "are the residuals of the trend fit
  * serially correlated?":
  *
  *   DW = Σ_{t≥2}(e_t − e_{t−1})² / Σ e_t²   ∈ [0, 4]
  *
  * with DW ≈ 2(1 − ρ̂₁): 2 = independent, → 0 positive, → 4 negative
  * autocorrelation.
  *
  * Exactness: the fit coefficients come from the q32/q207 fixed-point
  * sums (per-row terms floored onto the 1e-6 grid, summed as
  * DECIMAL(38,0) — order-free) through ONE shared-text rational
  * chain, so both engines hold bitwise-identical (b0, b1); each
  * residual e = y − b0 − b1·x is then bitwise-shared per row, and the
  * two DW sums are per-row 1e-6-floored integers again — no double
  * ever sums across rows (the q91/q103 micro-sum move). DW itself is
  * one shared-text division.
  *
  * Plan/scale: the registered series is the q207 CALENDAR-bounded
  * day-cell frame (one corpus-touch daily aggregate); the fit is one
  * keyed aggregate, the residual pass joins the 1-row-per-group fit
  * back BROADCAST, and the lag window is PARTITIONED by group over
  * the day spine (the q115 calendar-cell class — bounded by the date
  * span, never by fact rows). A thousand groups cost the same
  * shuffles. */
object DurbinWatson {

  /** Fixed-point snap scale (q32/q207 convention). */
  val FixedScale = 1000000.0

  private val Terms: Seq[(String, String)] = Seq(
    "sx" -> "x", "sy" -> "y", "sxx" -> "x * x", "sxy" -> "x * y")
  private def fixedSql(t: String): String =
    s"CAST(floor(($t) * $FixedScale) AS DECIMAL(38,0))"
  private def recExprs: Seq[String] = Terms.map { case (n, _) =>
    s"CAST(${n}_i AS DOUBLE) / $FixedScale AS $n"
  }
  private def recSql: String = recExprs.mkString(", ")

  private val Nd = "CAST(n_rows AS DOUBLE)"
  private val DenSql = s"($Nd * sxx - sx * sx)"
  private val GuardSql = s"(n_rows >= 3 AND abs($DenSql) > 1.0 / $FixedScale)"
  private val B1Sql = s"(($Nd * sxy - sx * sy) / $DenSql)"
  private val B0Sql = "((sy - b1 * sx) / " + Nd + ")"

  /** DW per group from a frame with (g, x, y): integer observation
    * order and double response. One row per group: (g, n_rows, b1,
    * dw, rho_1) — dw/rho NULL when the fit is singular (n < 3 or a
    * constant x) or the fit is exact (zero residual). */
  def dwTest(rows: DataFrame): DataFrame = {
    val pts = rows
      .filter(col("x").isNotNull && col("y").isNotNull)
      .selectExpr("g", "CAST(x AS DOUBLE) AS x", "CAST(y AS DOUBLE) AS y")
      // consumed twice (fit sums + the residual pass): checkpoint so
      // the upstream subtree runs once (round-9 no-duplicate-subtree)
      .localCheckpoint(true)
    val fit = pts.groupBy("g")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_rows"),
        Terms.map { case (n, t) =>
          expr(s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0))").as(s"${n}_i")
        }: _*)
      .selectExpr(Seq("g", "n_rows") ++ recExprs: _*)
      .selectExpr("g", "n_rows", "sx", "sy",
        s"CASE WHEN $GuardSql THEN $B1Sql END AS b1")
      .selectExpr("g", "n_rows", "b1", s"$B0Sql AS b0")
    val w = Window.partitionBy("g").orderBy("x")
    pts
      .join(broadcast(fit), "g")
      .withColumn("e", expr("y - (b0 + b1 * x)"))
      .withColumn("de", col("e") - lag("e", 1).over(w))
      .groupBy("g", "n_rows", "b1")
      .agg(
        expr(s"CAST(sum(${fixedSql("e * e")}) AS DECIMAL(38,0))").as("se2_i"),
        expr(s"CAST(sum(${fixedSql("de * de")}) AS DECIMAL(38,0))").as("sd2_i"))
      .selectExpr("g", "n_rows",
        "round(b1, 6) + 0.0 AS b1",
        "CAST(sd2_i AS DOUBLE) / nullif(CAST(se2_i AS DOUBLE), 0.0) AS dw_raw")
      .selectExpr("g", "n_rows", "b1",
        "round(dw_raw, 4) + 0.0 AS dw",
        "round(1.0 - dw_raw / 2.0, 4) + 0.0 AS rho_1")
  }

  /** q209: are the q207 daily-revenue trend residuals serially
    * correlated, per priority — the same day-cell frame (y in k$, the
    * q32/q164 feature-scale note), so a non-2 DW directly indicts the
    * q207 slope SEs. */
  def dailyRevenueDw(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS d",
        "CAST(floor(o_totalprice * 1e2) AS BIGINT) AS cents")
      .groupBy("g", "d")
      .agg(expr("CAST(sum(cents) AS BIGINT)").as("rev"))
    val span = daily.agg(min("d").as("d0"))
    dwTest(daily
      .crossJoin(broadcast(span))
      .selectExpr("g", "CAST(d - d0 AS BIGINT) AS x",
        "CAST(rev AS DOUBLE) / 1e5 AS y"))
      .withColumnRenamed("g", "o_orderpriority")
  }

  /** DuckDB twin: identical day cells, fixed-point fit, residual lag
    * walk, micro-summed DW. */
  val dailyRevenueDwSql: String = {
    val sums = Terms.map { case (n, t) =>
      s"CAST(sum(${fixedSql(t).replace("DECIMAL(38,0)", "HUGEINT")}) AS HUGEINT) AS ${n}_i"
    }.mkString(",\n       |    ")
    s"""WITH daily AS (
       |  SELECT o_orderpriority AS g,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
       |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS rev
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |  GROUP BY 1, 2),
       |span AS (SELECT min(d) AS d0 FROM daily),
       |pts AS (
       |  SELECT g, CAST(d - d0 AS DOUBLE) AS x,
       |    CAST(rev AS DOUBLE) / 1e5 AS y
       |  FROM daily CROSS JOIN span),
       |sums AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
       |    $sums
       |  FROM pts GROUP BY 1),
       |rec AS (SELECT g, n_rows, $recSql FROM sums),
       |fit AS (
       |  SELECT g, n_rows, sx, sy,
       |    CASE WHEN $GuardSql THEN $B1Sql END AS b1
       |  FROM rec),
       |fit2 AS (
       |  SELECT g, n_rows, b1, $B0Sql AS b0 FROM fit),
       |resid AS (
       |  SELECT p.g, n_rows, b1,
       |    y - (b0 + b1 * x) AS e,
       |    y - (b0 + b1 * x)
       |      - lag(y - (b0 + b1 * x)) OVER (PARTITION BY p.g ORDER BY x) AS de
       |  FROM pts p JOIN fit2 ON p.g = fit2.g),
       |agg AS (
       |  SELECT g, n_rows, b1,
       |    CAST(sum(CAST(floor((e * e) * $FixedScale) AS HUGEINT)) AS HUGEINT) AS se2_i,
       |    CAST(sum(CAST(floor((de * de) * $FixedScale) AS HUGEINT)) AS HUGEINT) AS sd2_i
       |  FROM resid GROUP BY 1, 2, 3),
       |dwv AS (
       |  SELECT g, n_rows, round(b1, 6) + 0.0 AS b1,
       |    CAST(sd2_i AS DOUBLE) / nullif(CAST(se2_i AS DOUBLE), 0.0) AS dw_raw
       |  FROM agg)
       |SELECT g AS o_orderpriority, n_rows, b1,
       |  round(dw_raw, 4) + 0.0 AS dw,
       |  round(1.0 - dw_raw / 2.0, 4) + 0.0 AS rho_1
       |FROM dwv""".stripMargin
  }
}
