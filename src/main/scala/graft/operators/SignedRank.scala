package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Wilcoxon signed-rank test — the PAIRED companion of q97's
  * Mann–Whitney (two independent samples) and the rank-robust
  * companion of a paired t-test: per subject, take the difference
  * between the two conditions, rank the |differences|, and ask whether
  * the positive-difference rank mass is bigger than chance. Detects a
  * consistent within-subject shift without assuming normality; exactly
  * the "did the same customers spend more this year?" question a mean
  * of noisy per-subject deltas answers badly (q169 McNemar is the
  * binary-outcome version of the same panel design).
  *
  * Exactness: differences are exact integer units (cents); zeros are
  * dropped on the EXACT difference (the standard convention), then
  * |d| is floored onto a coarser grid (`gridDiv`, dollars for the
  * registered query) whose ties the midrank + tie-corrected variance
  * absorb. Midranks over |d| cells use the q97 doubled-rank trick
  * (2·avgRank = 2·cumBefore + n(cell) + 1, all integers):
  *
  *   t_num = 4·W⁺ − n(n+1) = 2·Σ cp·r2 − n(n+1)          (exact Long)
  *   16σ²  = (2n(n+1)(2n+1) − Σ(t³−t)) / 3
  *   z     = t_num / sqrt(vi / 3)  with vi the exact integer numerator
  *
  * vi is carried as DECIMAL(38,0)/HUGEINT (4n³ passes 2⁶³ near
  * n ≈ 10⁶ subjects — the q152 stance); z is ONE shared-text chain,
  * round-4 snapped, then the A&S erfc p (q100 convention). vi = 0
  * (all ties in one cell... impossible with zeros dropped unless n = 0;
  * guarded anyway) yields NULL via nullif.
  *
  * Plan/scale: one scan → one subject-keyed aggregate (the pairing) →
  * one |d|-cell aggregate → a cumulative window over the VALUE-CELL
  * frame (cardinality bounded by the |d| grid — the q97/q48 class,
  * and the knob is `gridDiv`: a 100 TB run coarsens the grid, the tie
  * correction keeps the test exact) → one 1-row aggregate. */
object SignedRank {

  /** Signed-rank z/p from a frame with one exact-integer difference
    * column `d` (one row per paired subject). `gridDiv` coarsens |d|
    * for the rank cells (ties are midranked + variance-corrected).
    * Returns one row: (n_pairs, n_pos, n_neg, z_w, p_value). */
  def wilcoxonSignedRank(diffs: DataFrame, gridDiv: Long = 1L): DataFrame = {
    val cells = diffs
      .filter(col("d").isNotNull && col("d") =!= 0L)
      .selectExpr(s"abs(d) div $gridDiv AS g",
        "CASE WHEN d > 0 THEN 1 ELSE 0 END AS pos")
      .groupBy("g")
      .agg(expr("CAST(sum(pos) AS BIGINT)").as("cp"),
        expr("CAST(count(1) AS BIGINT)").as("cnt"))
    val w = Window.orderBy(col("g")).rowsBetween(Window.unboundedPreceding, -1)
    cells
      .withColumn("cb", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("r2", expr("2 * cb + cnt + 1"))
      .agg(
        expr("CAST(sum(cnt) AS BIGINT)").as("n_pairs"),
        expr("CAST(sum(cp) AS BIGINT)").as("n_pos"),
        expr("CAST(sum(cp * r2) AS BIGINT)").as("w2"),
        expr("CAST(sum(CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt) AS DECIMAL(38,0))").as("ties"))
      .selectExpr("n_pairs", "n_pos", "n_pairs - n_pos AS n_neg",
        "2 * w2 - n_pairs * (n_pairs + 1) AS t_num",
        "2 * CAST(n_pairs AS DECIMAL(38,0)) * (n_pairs + 1) * (2 * n_pairs + 1)" +
          " - ties AS vi")
      .selectExpr("n_pairs", "n_pos", "n_neg",
        s"round($ZSql, 4) + 0.0 AS z_w")
      .selectExpr("n_pairs", "n_pos", "n_neg", "z_w",
        s"round(${pSql("z_w")}, 6) + 0.0 AS p_value")
  }

  /** Shared-text z = t_num / √(vi/3) — NULL when the variance is 0. */
  private val ZSql =
    "CAST(t_num AS DOUBLE)" +
      " / sqrt(nullif(CAST(vi AS DOUBLE), 0.0) / 3.0)"

  /** Two-sided normal p via A&S 7.1.26 (the q100 shared chain). */
  private def pSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
  }

  /** q170: among customers ordering in BOTH 1996 and 1997, did
    * per-customer total spend shift? Differences in exact cents,
    * ranked on a whole-dollar grid. */
  def customerSpendShift(spark: SparkSession, dir: String): DataFrame =
    wilcoxonSignedRank(Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull
        && col("o_totalprice").isNotNull)
      .selectExpr("o_custkey AS cust",
        "year(CAST(o_orderdate AS DATE)) AS yr",
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents")
      .filter(col("yr").isin(1996, 1997))
      .groupBy("cust")
      .agg(expr("sum(CASE WHEN yr = 1996 THEN cents END)").as("s_a"),
        expr("sum(CASE WHEN yr = 1997 THEN cents END)").as("s_b"))
      .filter(col("s_a").isNotNull && col("s_b").isNotNull)
      .selectExpr("s_b - s_a AS d"),
      gridDiv = 100L)

  /** DuckDB twin: identical pairing, grid, midrank cells, z/p chain. */
  val customerSpendShiftSql: String =
    s"""WITH rows_ AS (
       |  SELECT o_custkey AS cust, year(CAST(o_orderdate AS DATE)) AS yr,
       |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
       |  FROM orders
       |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
       |    AND o_totalprice IS NOT NULL
       |    AND year(CAST(o_orderdate AS DATE)) IN (1996, 1997)),
       |pairs AS (
       |  SELECT cust,
       |    sum(CASE WHEN yr = 1996 THEN cents END) AS s_a,
       |    sum(CASE WHEN yr = 1997 THEN cents END) AS s_b
       |  FROM rows_ GROUP BY 1),
       |diffs AS (
       |  SELECT s_b - s_a AS d FROM pairs
       |  WHERE s_a IS NOT NULL AND s_b IS NOT NULL AND s_b - s_a <> 0),
       |cells AS (
       |  SELECT abs(d) // 100 AS g,
       |    CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM diffs GROUP BY 1),
       |ranked AS (
       |  SELECT cp, cnt,
       |    2 * coalesce(CAST(sum(cnt) OVER (ORDER BY g
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |    + cnt + 1 AS r2
       |  FROM cells),
       |agg AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS n_pairs,
       |    CAST(sum(cp) AS BIGINT) AS n_pos,
       |    CAST(sum(cp * r2) AS BIGINT) AS w2,
       |    CAST(sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS HUGEINT) AS ties
       |  FROM ranked),
       |stats AS (
       |  SELECT n_pairs, n_pos, n_pairs - n_pos AS n_neg,
       |    2 * w2 - n_pairs * (n_pairs + 1) AS t_num,
       |    2 * CAST(n_pairs AS HUGEINT) * (n_pairs + 1) * (2 * n_pairs + 1)
       |      - ties AS vi
       |  FROM agg),
       |z AS (
       |  SELECT n_pairs, n_pos, n_neg, round($ZSql, 4) + 0.0 AS z_w
       |  FROM stats)
       |SELECT n_pairs, n_pos, n_neg, z_w,
       |  round(${pSql("z_w")}, 6) + 0.0 AS p_value
       |FROM z""".stripMargin
}
