package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Huber M-regression (Huber 1964) — the missing EFFICIENCY point on
  * the robust-regression spectrum: q32's OLS is optimal at the
  * Gaussian but one corrupt batch owns its slope; q102's Theil–Sen
  * and q164's L1/quantile lines are highly resistant but pay real
  * efficiency at clean data. Huber's loss is quadratic inside a band
  * (OLS-efficient where the data is honest) and linear outside it
  * (outliers get bounded influence instead of squared leverage) —
  * the default robust line when you expect MOSTLY clean rows with a
  * contaminated tail, which is exactly the scraped-corpus regime.
  *
  * Estimator: IRLS with w = 1 if |r| ≤ δ else δ/|r| (the standard
  * majorizer — each step descends the Huber objective), [[Iters]]
  * fixed iterations from an OLS warm start (w ≡ 1). δ is a PINNED
  * literal in ABSOLUTE y units: the classical 1.345·σ̂ tuning needs a
  * scale estimate whose own estimator would have to be replicated
  * bit-for-bit; a domain-set band (document it like a spec threshold)
  * keeps the whole chain deterministic — the q94/q164 fixed-knob
  * stance. Rescale δ with y when porting the query.
  *
  * Cross-engine exactness: the q164 discipline verbatim — the chain
  * is RATIONAL (no exp/ln, nothing snaps); per-iteration sufficient
  * statistics are fixed-point sums (sum128 on Spark, the DECIMAL text
  * in the twin — same integers), the 2×2 Cramer solve and the weight
  * CASE are shared text on bitwise-identical doubles.
  *
  * Plan/scale: localCheckpoint the prepared rows once; each iteration
  * ONE map-side-combined aggregate (5 numbers over the wire) + a
  * broadcast 1-row coefficient join; coefficients materialized per
  * round so the plan is iters SHALLOW jobs (the q147/q164 lesson),
  * no driver loop over data. */
object HuberRegression {

  /** Huber band (absolute y units — k$ here), shared literal. */
  val DeltaSql = "CAST(10.0 AS DOUBLE)"
  /** IRLS iterations (fixed — determinism over adaptivity). */
  val Iters = 8
  /** Fixed-point snap scale for sufficient-statistic terms (q32). */
  val FixedScale = 1000000.0

  private val Terms: Seq[(String, String)] = Seq(
    "sw" -> "w", "sx" -> "w * x", "sxx" -> "w * x * x",
    "sy" -> "w * y", "sxy" -> "w * x * y")
  private def fixedSql(t: String): String =
    s"CAST(floor(($t) * $FixedScale) AS DECIMAL(38,0))"
  private def sum128Sql(t: String): String =
    s"sum128(CAST(floor(($t) * $FixedScale) AS BIGINT))"
  private val SumsSql: String = Terms.map { case (n, t) =>
    s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0)) AS ${n}_i"
  }.mkString(", ")
  private val RecSql: String = Terms.map { case (n, _) =>
    s"CAST(${n}_i AS DOUBLE) / $FixedScale AS $n"
  }.mkString(", ")

  private val DetSql = "(sw * sxx - sx * sx)"
  private val B0Sql = "(sxx * sy - sx * sxy)"
  private val B1Sql = "(sw * sxy - sx * sy)"
  private val GuardSql = s"n_rows >= 2 AND abs($DetSql) > 1.0 / $FixedScale"
  private val EtaSql = "b0 + b1 * x"
  /** The Huber majorizer weight — branch on bitwise-identical r. */
  private val WSql =
    s"(CASE WHEN abs(y - eta) <= $DeltaSql THEN 1.0" +
      s" ELSE $DeltaSql / abs(y - eta) END)"

  /** Huber fit over a frame with double columns (x, y): ONE row —
    * n_rows, coefficients, mean absolute residual, and frac_core
    * (share of rows inside the quadratic band — the "how Gaussian is
    * this data really" readout). */
  def huberFit(rows: DataFrame, iters: Int = Iters): DataFrame = {
    val pinned = rows
      .selectExpr("CAST(x AS DOUBLE) AS x", "CAST(y AS DOUBLE) AS y")
      .localCheckpoint(true) // iters+2 aggregate passes re-read it
    def solved(src: DataFrame): DataFrame =
      src.agg(count(lit(1)).as("n_rows"),
        Terms.map { case (n, t) => expr(sum128Sql(t)).as(s"${n}_i") }: _*)
        .selectExpr("n_rows" +: Terms.map { case (n, _) =>
          s"CAST(${n}_i AS DOUBLE) / $FixedScale AS $n" }: _*)
        .selectExpr("n_rows",
          s"CASE WHEN $GuardSql THEN $B0Sql / nullif($DetSql, 0.0) END AS b0",
          s"CASE WHEN $GuardSql THEN $B1Sql / nullif($DetSql, 0.0) END AS b1")
        .localCheckpoint(true) // feeds the next round's join (q147)
    var b = solved(pinned.selectExpr("x", "y", "1.0 AS w"))
    for (_ <- 0 until iters) {
      b = solved(pinned.crossJoin(broadcast(b.select("b0", "b1")))
        .selectExpr("x", "y", s"$EtaSql AS eta")
        .selectExpr("x", "y", s"$WSql AS w"))
    }
    pinned.crossJoin(broadcast(b.select("b0", "b1")))
      .selectExpr("y", "b0", "b1", s"$EtaSql AS eta")
      .agg(count(lit(1)).as("n_rows"),
        expr(sum128Sql("abs(y - eta)")).as("sa_i"),
        expr(s"CAST(sum(CASE WHEN abs(y - eta) <= $DeltaSql THEN 1" +
          " ELSE 0 END) AS BIGINT)").as("core"),
        expr("first(b0)").as("b0"), expr("first(b1)").as("b1"))
      .selectExpr("n_rows",
        "round(b0, 6) + 0.0 AS b_intercept",
        "round(b1, 6) + 0.0 AS b_slope",
        s"round(CAST(sa_i AS DOUBLE) / $FixedScale" +
          " / CAST(n_rows AS DOUBLE), 6) + 0.0 AS mean_abs_resid",
        "round(CAST((1000000 * core) div n_rows AS DOUBLE) / 1e6, 6)" +
          " + 0.0 AS frac_core")
  }

  /** q251: the robust line-revenue fit on the EXACT q32/q164 frame
    * (k$ revenue vs quantity) — read the three slopes together: OLS
    * (q32, mean), P50 (q164, median), Huber (bounded-influence mean);
    * where they disagree the contaminated tail is doing the talking
    * (on THIS testdata all three read ≈ 0 — prices independent of
    * quantity, the q242-documented fact; the agreement is itself the
    * clean-data reading). δ = 10 k$: revenue residuals beyond ten
    * grand get linear, not squared, influence. */
  def lineRevenueHuber(spark: SparkSession, dir: String): DataFrame =
    huberFit(Tables.lineitem(spark, dir)
      .selectExpr("CAST(l_quantity AS DOUBLE) AS x",
        "CAST(l_extendedprice AS DOUBLE) / 1000.0 AS y"))

  /** DuckDB twin: the unrolled CTE cascade from the same shared
    * fragments. */
  val lineRevenueHuberSql: String = {
    def solveCte(k: Int, src: String): String =
      s"""r$k AS (SELECT n_rows, $RecSql FROM $src),
         |c$k AS (SELECT
         |  CASE WHEN $GuardSql THEN $B0Sql / nullif($DetSql, 0.0) END AS b0,
         |  CASE WHEN $GuardSql THEN $B1Sql / nullif($DetSql, 0.0) END AS b1
         |FROM r$k)""".stripMargin
    val iterCtes = (1 to Iters).map { k =>
      s"""wrk$k AS (
         |  SELECT $WSql AS w, x, y
         |  FROM (SELECT b.x, b.y, $EtaSql AS eta
         |        FROM base b CROSS JOIN c${k - 1})),
         |s$k AS (SELECT count(*) AS n_rows, $SumsSql FROM wrk$k),
         |${solveCte(k, s"s$k")}""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT CAST(l_quantity AS DOUBLE) AS x,
       |    CAST(l_extendedprice AS DOUBLE) / 1000.0 AS y
       |  FROM lineitem),
       |s0 AS (SELECT count(*) AS n_rows, $SumsSql
       |FROM (SELECT 1.0 AS w, x, y FROM base)),
       |${solveCte(0, "s0")},
       |$iterCtes,
       |fin AS (
       |  SELECT b.y, b0, b1, $EtaSql AS eta
       |  FROM base b CROSS JOIN c$Iters),
       |agg AS (
       |  SELECT count(*) AS n_rows,
       |    CAST(sum(${fixedSql("abs(y - eta)")}) AS DECIMAL(38,0)) AS sa_i,
       |    CAST(sum(CASE WHEN abs(y - eta) <= $DeltaSql THEN 1 ELSE 0 END)
       |      AS BIGINT) AS core,
       |    first(b0) AS b0, first(b1) AS b1
       |  FROM fin)
       |SELECT n_rows,
       |  round(b0, 6) + 0.0 AS b_intercept,
       |  round(b1, 6) + 0.0 AS b_slope,
       |  round(CAST(sa_i AS DOUBLE) / $FixedScale
       |    / CAST(n_rows AS DOUBLE), 6) + 0.0 AS mean_abs_resid,
       |  round(CAST((1000000 * core) // n_rows AS DOUBLE) / 1e6, 6)
       |    + 0.0 AS frac_core
       |FROM agg""".stripMargin
  }
}
