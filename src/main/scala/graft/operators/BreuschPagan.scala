package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Breusch–Pagan heteroscedasticity diagnostic (Koenker's studentized
  * form) — the second trust check on the deck's OLS trend fits,
  * completing q209's pair: Durbin–Watson asks "are the residuals
  * serially correlated?", BP asks "does their VARIANCE move with the
  * regressor?". Either failure invalidates the constant-σ² SEs that
  * q32/q207/q222 report. Koenker (1981) replaces the original
  * normality-bound score with the robust auxiliary-R² form:
  *
  *   LM = n · R²  of the regression  e² ~ x,     LM ~ χ²(1)
  *
  * and with one regressor R² is just corr(e², x)², so the whole test
  * is closed-form in exact sums — no second matrix solve.
  *
  * Exactness (the q209 doctrine verbatim): the fit coefficients come
  * from fixed-point sums (per-row terms floored onto the 1e-6 grid,
  * summed DECIMAL(38,0) — order-free) through ONE shared-text rational
  * chain, so both engines hold bitwise-identical (b0, b1); each
  * residual e = y − b0 − b1·x is bitwise-shared per row, and the five
  * auxiliary sums (u, u², u·x, x, x² for u = e²) are per-row
  * 1e-6-floored integers again — no double ever sums across rows. LM
  * and the χ²₁ tail ride one shared-text chain: for 1 df the upper
  * tail IS the two-sided normal p of z = √LM (erfc(√(LM/2))), so the
  * house A&S 7.1.26 chain applies with no Wilson–Hilferty detour.
  *
  * Plan/scale: identical to q209 — the registered series is the q207
  * calendar-bounded day-cell frame (one corpus-touch daily aggregate);
  * the fit is one keyed aggregate, the residual pass joins the
  * 1-row-per-group fit back BROADCAST, and the auxiliary pass is a
  * second keyed aggregate over the same day cells (no window at all —
  * BP, unlike DW, needs no lag). A thousand groups cost the same two
  * shuffles; day-cell cardinality, never fact rows, bounds everything
  * after the scan.
  */
object BreuschPagan {

  /** Fixed-point snap scale (q32/q207/q209 convention). */
  val FixedScale = 1000000.0

  private val FitTerms: Seq[(String, String)] = Seq(
    "sx" -> "x", "sy" -> "y", "sxx" -> "x * x", "sxy" -> "x * y")
  /** Auxiliary-stage sums over u = e²; x-sums recomputed under fresh
    * names so the twin's CTE chain never aliases across stages. */
  private val AuxTerms: Seq[(String, String)] = Seq(
    "su" -> "u", "suu" -> "u * u", "sux" -> "u * x",
    "tx" -> "x", "txx" -> "x * x")
  private def fixedSql(t: String): String =
    s"CAST(floor(($t) * $FixedScale) AS DECIMAL(38,0))"
  private def recExprs(terms: Seq[(String, String)]): Seq[String] =
    terms.map { case (n, _) => s"CAST(${n}_i AS DOUBLE) / $FixedScale AS $n" }

  private val Nd = "CAST(n_rows AS DOUBLE)"
  private val DenSql = s"($Nd * sxx - sx * sx)"
  private val GuardSql = s"(n_rows >= 4 AND abs($DenSql) > 1.0 / $FixedScale)"
  private val B1Sql = s"(($Nd * sxy - sx * sy) / $DenSql)"
  private val B0Sql = "((sy - b1 * sx) / " + Nd + ")"

  /** Shared LM text over the recovered auxiliary doubles: LM = n·R²
    * with R² = (nΣux − ΣuΣx)² / ((nΣxx − Σx²)(nΣuu − Σu²)). A
    * zero-variance u (exact fit, or constant residual) or x hits the
    * nullif — NULL, never an ANSI error. */
  private val LmSql: String = {
    val num = s"($Nd * sux - su * tx)"
    val denx = s"($Nd * txx - tx * tx)"
    val denu = s"($Nd * suu - su * su)"
    s"($Nd * $num * $num / nullif($denx * $denu, 0.0))"
  }

  /** χ²₁ upper tail from the round-4-snapped z = √LM: two-sided normal
    * p via the house A&S 7.1.26 erfc chain (|err| ≤ 1.5e-7, below the
    * round-6 output grid). */
  private def pSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
  }

  /** Koenker BP per group from a frame with (g, x, y). One row per
    * group: (g, n_rows, b1, lm_stat, p_bp) — lm/p NULL when the fit is
    * singular (n < 4 or constant x) or the auxiliary variance is
    * exactly zero. */
  def bpTest(rows: DataFrame): DataFrame = {
    val pts = rows
      .filter(col("x").isNotNull && col("y").isNotNull)
      .selectExpr("g", "CAST(x AS DOUBLE) AS x", "CAST(y AS DOUBLE) AS y")
      // consumed twice (fit sums + the auxiliary pass): checkpoint so
      // the upstream subtree runs once (round-9 no-duplicate-subtree)
      .localCheckpoint(true)
    val fit = pts.groupBy("g")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_rows"),
        FitTerms.map { case (n, t) =>
          expr(s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0))").as(s"${n}_i")
        }: _*)
      .selectExpr(Seq("g", "n_rows") ++ recExprs(FitTerms): _*)
      .selectExpr("g", "n_rows", "sx", "sy",
        s"CASE WHEN $GuardSql THEN $B1Sql END AS b1")
      .selectExpr("g", "n_rows", "b1", s"$B0Sql AS b0")
    pts
      .join(broadcast(fit), "g")
      .withColumn("u", expr("(y - (b0 + b1 * x)) * (y - (b0 + b1 * x))"))
      .groupBy("g", "n_rows", "b1")
      .agg(
        expr(s"CAST(sum(${fixedSql(AuxTerms.head._2)}) AS DECIMAL(38,0))")
          .as(s"${AuxTerms.head._1}_i"),
        AuxTerms.tail.map { case (n, t) =>
          expr(s"CAST(sum(${fixedSql(t)}) AS DECIMAL(38,0))").as(s"${n}_i")
        }: _*)
      .selectExpr(Seq("g", "n_rows", "b1") ++ recExprs(AuxTerms): _*)
      .selectExpr("g", "n_rows", "round(b1, 6) + 0.0 AS b1",
        s"round($LmSql, 4) + 0.0 AS lm_stat")
      .selectExpr("g", "n_rows", "b1", "lm_stat",
        "round(sqrt(lm_stat), 4) AS z_lm")
      .selectExpr("g", "n_rows", "b1", "lm_stat",
        s"round(${pSql("z_lm")}, 6) + 0.0 AS p_bp")
  }

  /** q263: does the q207/q209 daily-revenue trend's residual VARIANCE
    * drift with time, per priority — same day-cell frame (y in k$, the
    * q32/q164 feature-scale note), so a small p directly indicts the
    * q207 slope SEs the way a non-2 DW does. */
  def dailyRevenueBp(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS d",
        "CAST(floor(o_totalprice * 1e2) AS BIGINT) AS cents")
      .groupBy("g", "d")
      .agg(expr("CAST(sum(cents) AS BIGINT)").as("rev"))
    val span = daily.agg(min("d").as("d0"))
    bpTest(daily
      .crossJoin(broadcast(span))
      .selectExpr("g", "CAST(d - d0 AS BIGINT) AS x",
        "CAST(rev AS DOUBLE) / 1e5 AS y"))
      .withColumnRenamed("g", "o_orderpriority")
  }

  /** DuckDB twin: identical day cells, fixed-point fit, shared-text
    * residual square, micro-summed auxiliary moments, shared LM/erfc
    * chain. */
  val dailyRevenueBpSql: String = {
    val fitSums = FitTerms.map { case (n, t) =>
      s"CAST(sum(${fixedSql(t).replace("DECIMAL(38,0)", "HUGEINT")}) AS HUGEINT) AS ${n}_i"
    }.mkString(",\n       |    ")
    val auxSums = AuxTerms.map { case (n, t) =>
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
       |  SELECT g, n_rows, sx, sy,
       |    CASE WHEN $GuardSql THEN $B1Sql END AS b1
       |  FROM rec),
       |fit2 AS (
       |  SELECT g, n_rows, b1, $B0Sql AS b0 FROM fit),
       |resid AS (
       |  SELECT p.g, n_rows, b1, x,
       |    (y - (b0 + b1 * x)) * (y - (b0 + b1 * x)) AS u
       |  FROM pts p JOIN fit2 ON p.g = fit2.g),
       |agg AS (
       |  SELECT g, n_rows, b1,
       |    $auxSums
       |  FROM resid GROUP BY 1, 2, 3),
       |rec2 AS (
       |  SELECT g, n_rows, b1, ${recExprs(AuxTerms).mkString(", ")} FROM agg),
       |lm AS (
       |  SELECT g, n_rows, round(b1, 6) + 0.0 AS b1,
       |    round($LmSql, 4) + 0.0 AS lm_stat
       |  FROM rec2),
       |z AS (
       |  SELECT g, n_rows, b1, lm_stat,
       |    round(sqrt(lm_stat), 4) AS z_lm
       |  FROM lm)
       |SELECT g AS o_orderpriority, n_rows, b1, lm_stat,
       |  round(${pSql("z_lm")}, 6) + 0.0 AS p_bp
       |FROM z""".stripMargin
  }
}
