package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cook's distance influence audit — the third trust check on the
  * deck's OLS trend fits, closing the q209/q263 triad: DW asks "are
  * residuals serially correlated?", BP asks "does their variance
  * drift?", Cook's D asks "is the fit a hostage of a handful of
  * days?" For simple regression, with leverage
  * h_i = 1/n + (x_i − x̄)²/Sxx and s² = SSE/(n−2),
  *
  *   D_i = e_i²·h_i / (2·s²·(1−h_i)²)
  *
  * — the squared change in the fitted line, in standard-error units,
  * from deleting observation i. The audit reports each group's worst
  * day and how many days clear the 4/n influence convention.
  *
  * Exactness: the q263 doctrine — fit sums are 1e-6-floored
  * DECIMAL(38,0) integers through the shared 2×2 chain, residual and
  * SSE passes floor per-row before summing, and every per-day D rides
  * ONE shared-text double chain floored to integer nano-units, so the
  * max/argmax/threshold comparisons are INTEGER comparisons in both
  * engines (argmax tie-break: smallest day — deterministic by
  * construction).
  *
  * Plan/scale: one corpus scan → day cells (the q207 frame,
  * checkpointed); fit and SSE are two keyed day-cell aggregates with
  * broadcast joins back; the influence scan and its argmax join are
  * value-level. Group count never multiplies corpus passes. */
object Cooks {

  val FixedScale = 1000000.0

  private val FitTerms: Seq[(String, String)] = Seq(
    "sx" -> "x", "sy" -> "y", "sxx" -> "x * x", "sxy" -> "x * y")
  private def fixedSql(t: String): String =
    s"CAST(floor(($t) * $FixedScale) AS DECIMAL(38,0))"
  private def recExprs(terms: Seq[(String, String)]): Seq[String] =
    terms.map { case (n, _) => s"CAST(${n}_i AS DOUBLE) / $FixedScale AS $n" }

  private val Nd = "CAST(n_rows AS DOUBLE)"
  private val DenSql = s"($Nd * sxx - sx * sx)"
  private val GuardSql = s"(n_rows >= 4 AND abs($DenSql) > 1.0 / $FixedScale)"
  private val B1Sql = s"(($Nd * sxy - sx * sy) / $DenSql)"
  private val B0Sql = "((sy - b1 * sx) / " + Nd + ")"
  /** Centered Sxx = sxx − sx²/n over the recovered doubles. */
  private val SxxcSql = s"(sxx - sx * sx / $Nd)"

  /** Per-day influence chain over (x, e², n_rows, sx, sxxc, sse):
    * h = 1/n + (x−x̄)²/Sxx, s² = sse/(n−2),
    * D = e²·h/(2·s²·(1−h)²) — floored to exact nano-units. */
  private val HSql =
    s"(1.0 / $Nd + (x - sx / $Nd) * (x - sx / $Nd) / $SxxcSql)"
  private val DSql =
    s"(e2 * h / (2.0 * (sse / ($Nd - 2.0)) * (1.0 - h) * (1.0 - h)))"

  /** Cook's distance audit per group from (g, x, y). One row per
    * group: (g, n_rows, max_d, argmax_x, n_influential) — NULL audit
    * when the fit is singular. */
  def cooksAudit(rows: DataFrame): DataFrame = {
    val pts = rows
      .filter(col("x").isNotNull && col("y").isNotNull)
      .selectExpr("g", "CAST(x AS DOUBLE) AS x", "CAST(y AS DOUBLE) AS y")
      .localCheckpoint(true) // fit pass + SSE pass + influence pass
    val fit = pts.groupBy("g")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_rows"),
        FitTerms.map { case (n, t) =>
          expr(s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0))").as(s"${n}_i")
        }: _*)
      .selectExpr(Seq("g", "n_rows") ++ recExprs(FitTerms): _*)
      .selectExpr("g", "n_rows", "sx", "sy", "sxx",
        s"CASE WHEN $GuardSql THEN $B1Sql END AS b1")
      .selectExpr("g", "n_rows", "sx", "sxx", "b1", s"$B0Sql AS b0")
    val resid = pts
      .join(broadcast(fit), "g")
      .withColumn("e2", expr("(y - (b0 + b1 * x)) * (y - (b0 + b1 * x))"))
      .localCheckpoint(true) // SSE aggregate + influence scan
    val sse = resid
      .groupBy("g")
      .agg(expr(s"CAST(sum(${fixedSql("e2")}) AS DECIMAL(38,0))").as("sse_i"))
      .selectExpr("g", s"CAST(sse_i AS DOUBLE) / $FixedScale AS sse")
    val infl = resid
      .join(broadcast(sse), "g")
      .withColumn("h", expr(HSql))
      .withColumn("d_nano", expr(
        s"CAST(floor($DSql * 1e9) AS BIGINT)"))
      .localCheckpoint(true) // audit aggregate + argmax join
    val audit = infl
      .groupBy("g", "n_rows")
      .agg(
        max("d_nano").as("max_dn"),
        sum(expr(
          // 4/n convention on the same nano grid: D > 4/n
          "CAST(d_nano * n_rows > CAST(4e9 AS BIGINT) AS BIGINT)"))
          .as("n_influential"))
    infl.select(col("g"), col("x"), col("d_nano"))
      .join(broadcast(audit), "g")
      .filter(col("d_nano") === col("max_dn"))
      .groupBy("g", "n_rows", "max_dn", "n_influential")
      .agg(min("x").as("argmax_x"))
      .selectExpr("g", "n_rows",
        "round(CAST(max_dn AS DOUBLE) / 1e9, 6) + 0.0 AS max_d",
        "CAST(argmax_x AS BIGINT) AS argmax_x", "n_influential")
  }

  /** q283: which single day most bends each priority's daily-revenue
    * trend (the q207/q209/q263 frame: x = days from first day,
    * y = revenue in k$)? */
  def dailyRevenueCooks(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS d",
        "CAST(floor(o_totalprice * 1e2) AS BIGINT) AS cents")
      .groupBy("g", "d")
      .agg(expr("CAST(sum(cents) AS BIGINT)").as("rev"))
    val span = daily.agg(min("d").as("d0"))
    cooksAudit(daily
      .crossJoin(broadcast(span))
      .selectExpr("g", "CAST(d - d0 AS BIGINT) AS x",
        "CAST(rev AS DOUBLE) / 1e5 AS y"))
      .withColumnRenamed("g", "o_orderpriority")
  }

  /** DuckDB twin: identical day cells, fixed-point fit/SSE, nano-grid
    * influence, integer argmax with the min-day tie-break. */
  val dailyRevenueCooksSql: String = {
    val fitSums = FitTerms.map { case (n, t) =>
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
       |    $fitSums
       |  FROM pts GROUP BY 1),
       |rec AS (SELECT g, n_rows, ${recExprs(FitTerms).mkString(", ")} FROM sums),
       |fit AS (
       |  SELECT g, n_rows, sx, sy, sxx,
       |    CASE WHEN $GuardSql THEN $B1Sql END AS b1
       |  FROM rec),
       |fit2 AS (SELECT g, n_rows, sx, sxx, b1, $B0Sql AS b0 FROM fit),
       |resid AS (
       |  SELECT p.g, n_rows, sx, sxx, x,
       |    (y - (b0 + b1 * x)) * (y - (b0 + b1 * x)) AS e2
       |  FROM pts p JOIN fit2 ON p.g = fit2.g),
       |ssef AS (
       |  SELECT g, CAST(CAST(sum(${fixedSql("e2").replace(
      "DECIMAL(38,0)", "HUGEINT")}) AS HUGEINT) AS DOUBLE)
       |      / $FixedScale AS sse
       |  FROM resid GROUP BY 1),
       |infl AS (
       |  SELECT r.g, n_rows, x,
       |    CAST(floor($DSql * 1e9) AS BIGINT) AS d_nano
       |  FROM (
       |    SELECT g, n_rows, x, e2, $HSql AS h, sx, sxx
       |    FROM resid) r JOIN ssef ON r.g = ssef.g),
       |audit AS (
       |  SELECT g, n_rows, max(d_nano) AS max_dn,
       |    CAST(sum(CAST(d_nano * n_rows > CAST(4e9 AS BIGINT) AS BIGINT))
       |      AS BIGINT) AS n_influential
       |  FROM infl GROUP BY 1, 2)
       |SELECT i.g AS o_orderpriority, i.n_rows,
       |  round(CAST(max_dn AS DOUBLE) / 1e9, 6) + 0.0 AS max_d,
       |  CAST(min(x) AS BIGINT) AS argmax_x, n_influential
       |FROM infl i JOIN audit a ON i.g = a.g AND i.d_nano = a.max_dn
       |GROUP BY 1, 2, max_dn, n_influential""".stripMargin
  }
}
