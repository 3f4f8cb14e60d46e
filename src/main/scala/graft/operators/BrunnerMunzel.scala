package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Brunner–Munzel test (2000) — "the rank Welch", closing the
  * two-sample robustness ladder on the q96 comparison: q96's Welch t
  * compares MEANS (whales own it), q194's Yuen compares trimmed
  * means, q97's Mann–Whitney compares ranks but silently assumes
  * equal shapes under H₀ (heteroscedastic groups break its variance);
  * BM tests the relative effect p = P(X < Y) + ½P(X = Y) with a
  * variance estimated SEPARATELY per group from rank PLACEMENTS —
  * the nonparametric Behrens–Fisher solution, and the modern default
  * recommendation over MWU when spreads differ.
  *
  * EXACTNESS: everything runs on value cells with DOUBLED midranks
  * (the q97 trick, combined AND within-group), so each cell's doubled
  * placement p2 = R2 − r2 is an exact integer; the per-group
  * placement variances clear to (nΣp2² − (Σp2)²)/(n(n−1)) in
  * DECIMAL(38,0), and the doubling CANCELS ALGEBRAICALLY in the
  * statistic — W = n₁n₂·md2/(N·√(n₁v₁d + n₂v₂d)) with md2 the
  * doubled mean-rank difference (derivation in code) — so W, the
  * Satterthwaite df (4s cancel in its (2,2)-power ratio too) and the
  * exact-integer effect p̂ = (ΣR2₂ − n₂(n₂+1))/(2n₁n₂) are each ONE
  * shared-text chain over exact integers. Degenerate placements
  * (all-tied: both variances 0) → NULL via nullif. p-value from the
  * two-sided normal (A&S erfc; BM's t_df and the normal agree to
  * <1e-4 at registered-N scale — df is SHIPPED so small-N callers
  * can see the approximation, the q182 convention).
  *
  * Plan/scale: one fact scan → (g, side, value-cell) aggregate; both
  * rank windows run over VALUE CELLS on a hundred-dollar grid (the
  * q170/q176 knob — ties the grid creates are handled exactly by
  * midranks + the placement variance), group totals broadcast, one
  * keyed finish. */
object BrunnerMunzel {

  /** BM from cells (g, s ∈ {0, 1}, v, c): side 0 = X, side 1 = Y.
    * Returns per group (g, n_x, n_y, p_hat, w_bm, df, p_value). */
  def bmTest(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byVal = cells.groupBy("g", "v")
      .agg(expr("CAST(sum(c) AS BIGINT)").as("ct"))
      .withColumn("cb", coalesce(sum(col("ct")).over(
        Window.partitionBy("g").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .selectExpr("g", "v", "2 * cb + ct + 1 AS r2c")
    val within = cells
      .withColumn("cbs", coalesce(sum(col("c")).over(
        Window.partitionBy("g", "s").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .selectExpr("g", "s", "v", "c", "2 * cbs + c + 1 AS r2w")
    val sides = within.join(byVal, Seq("g", "v"))
      .selectExpr("g", "s", "c", "r2c", "r2c - r2w AS p2")
      .groupBy("g", "s")
      .agg(expr("CAST(sum(c) AS BIGINT)").as("n"),
        expr("CAST(sum(CAST(c AS DECIMAL(38,0)) * r2c) AS DECIMAL(38,0))")
          .as("sr"),
        expr("CAST(sum(CAST(c AS DECIMAL(38,0)) * p2) AS DECIMAL(38,0))")
          .as("sp"),
        expr("CAST(sum(CAST(c AS DECIMAL(38,0)) * p2 * p2)" +
          " AS DECIMAL(38,0))").as("sp2"))
    // pivot the two sides wide, then one shared-text finish
    val wide = sides.groupBy("g").agg(
      expr("max(CASE WHEN s = 0 THEN n END)").as("n1"),
      expr("max(CASE WHEN s = 0 THEN sr END)").as("sr1"),
      expr("max(CASE WHEN s = 0 THEN sp END)").as("sp1"),
      expr("max(CASE WHEN s = 0 THEN sp2 END)").as("sp21"),
      expr("max(CASE WHEN s = 1 THEN n END)").as("n2"),
      expr("max(CASE WHEN s = 1 THEN sr END)").as("sr2"),
      expr("max(CASE WHEN s = 1 THEN sp END)").as("sp2b"),
      expr("max(CASE WHEN s = 1 THEN sp2 END)").as("sp22_"))
    wide.selectExpr("g", "n1", "n2", "sr1", "sr2", "sp1", "sp21",
        "sp2b", "sp22_")
      .filter("n1 IS NOT NULL AND n2 IS NOT NULL AND n1 >= 2 AND n2 >= 2")
      .selectExpr("g", "n1 AS n_x", "n2 AS n_y",
        // doubled placement variances (4·S²): exact DECIMAL ratios
        "CAST(n1 * sp21 - sp1 * sp1 AS DOUBLE)" +
          " / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) AS v1d",
        "CAST(n2 * sp22_ - sp2b * sp2b AS DOUBLE)" +
          " / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) AS v2d",
        // doubled mean-rank difference md2 = 2(R̄₂ − R̄₁)
        "CAST(n1 * sr2 - n2 * sr1 AS DOUBLE)" +
          " / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS md2",
        // exact-integer relative effect
        "round(CAST(sr2 - CAST(n2 AS DECIMAL(38,0)) * (n2 + 1) AS DOUBLE)" +
          " / (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) + 0.0" +
          " AS p_hat")
      .selectExpr("g", "n_x", "n_y", "p_hat",
        // W = n₁n₂·md2/(N·√(n₁v1d + n₂v2d)): the doubling cancels —
        // md2/2 / √(v/4) = md2/√v(doubled)
        "round(CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE) * md2" +
          " / ((CAST(n_x AS DOUBLE) + CAST(n_y AS DOUBLE))" +
          " * nullif(sqrt(CAST(n_x AS DOUBLE) * v1d" +
          " + CAST(n_y AS DOUBLE) * v2d), 0.0)), 4) + 0.0 AS w_bm",
        // Satterthwaite df over the same terms (4-powers cancel)
        "round((CAST(n_x AS DOUBLE) * v1d + CAST(n_y AS DOUBLE) * v2d)" +
          " * (CAST(n_x AS DOUBLE) * v1d + CAST(n_y AS DOUBLE) * v2d)" +
          " / nullif((CAST(n_x AS DOUBLE) * v1d) * (CAST(n_x AS DOUBLE)" +
          " * v1d) / (CAST(n_x AS DOUBLE) - 1.0)" +
          " + (CAST(n_y AS DOUBLE) * v2d) * (CAST(n_y AS DOUBLE) * v2d)" +
          " / (CAST(n_y AS DOUBLE) - 1.0), 0.0), 4) + 0.0 AS df")
      .selectExpr("g", "n_x", "n_y", "p_hat", "w_bm", "df",
        s"round(${pTwoSidedSql("w_bm")}, 6) + 0.0 AS p_value")
  }

  /** Two-sided normal p via the A&S 7.1.26 erfc chain (q100 text). */
  private def pTwoSidedSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741)" +
      s" * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
  }

  /** q256: F- vs O-status order value per priority on the EXACT q96
    * comparison (hundred-dollar grid) — read beside q96 (means) and
    * q194 (trimmed means): three robustness rungs, one frame. */
  def orderValueBm(spark: SparkSession, dir: String): DataFrame =
    bmTest(Tables.orders(spark, dir)
      .filter(col("o_orderpriority").isNotNull
        && col("o_orderstatus").isin("F", "O")
        && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END AS s",
        "CAST(floor(o_totalprice / 100) AS BIGINT) AS v")
      .groupBy("g", "s", "v")
      .agg(expr("CAST(count(1) AS BIGINT)").as("c")))
      .withColumnRenamed("g", "o_orderpriority")

  /** DuckDB twin: identical cells, doubled midranks, cleared
    * variances, shared finish. */
  val orderValueBmSql: String = {
    val x = "(abs(w_bm) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val p = s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741)" +
      s" * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
    s"""WITH cells AS (
       |  SELECT o_orderpriority AS g,
       |    CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END AS s,
       |    CAST(floor(o_totalprice / 100) AS BIGINT) AS v,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM orders
       |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IN ('F', 'O')
       |    AND o_totalprice IS NOT NULL
       |  GROUP BY 1, 2, 3),
       |byval AS (
       |  SELECT g, v, 2 * coalesce(sum(sum(c)) OVER (PARTITION BY g
       |      ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      0) + sum(c) + 1 AS r2c
       |  FROM cells GROUP BY g, v),
       |within AS (
       |  SELECT g, s, v, c,
       |    2 * coalesce(sum(c) OVER (PARTITION BY g, s ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      + c + 1 AS r2w
       |  FROM cells),
       |sides AS (
       |  SELECT w.g, s, CAST(sum(c) AS BIGINT) AS n,
       |    CAST(sum(CAST(c AS DECIMAL(38,0)) * r2c) AS DECIMAL(38,0)) AS sr,
       |    CAST(sum(CAST(c AS DECIMAL(38,0)) * (r2c - r2w))
       |      AS DECIMAL(38,0)) AS sp,
       |    CAST(sum(CAST(c AS DECIMAL(38,0)) * (r2c - r2w) * (r2c - r2w))
       |      AS DECIMAL(38,0)) AS sp2
       |  FROM within w JOIN byval b ON w.g = b.g AND w.v = b.v
       |  GROUP BY 1, 2),
       |wide AS (
       |  SELECT g,
       |    max(CASE WHEN s = 0 THEN n END) AS n1,
       |    max(CASE WHEN s = 0 THEN sr END) AS sr1,
       |    max(CASE WHEN s = 0 THEN sp END) AS sp1,
       |    max(CASE WHEN s = 0 THEN sp2 END) AS sp21,
       |    max(CASE WHEN s = 1 THEN n END) AS n2,
       |    max(CASE WHEN s = 1 THEN sr END) AS sr2,
       |    max(CASE WHEN s = 1 THEN sp END) AS sp2b,
       |    max(CASE WHEN s = 1 THEN sp2 END) AS sp22_
       |  FROM sides GROUP BY 1),
       |forms AS (
       |  SELECT g, n1 AS n_x, n2 AS n_y,
       |    CAST(n1 * sp21 - sp1 * sp1 AS DOUBLE)
       |      / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) AS v1d,
       |    CAST(n2 * sp22_ - sp2b * sp2b AS DOUBLE)
       |      / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) AS v2d,
       |    CAST(n1 * sr2 - n2 * sr1 AS DOUBLE)
       |      / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS md2,
       |    round(CAST(sr2 - CAST(n2 AS DECIMAL(38,0)) * (n2 + 1) AS DOUBLE)
       |      / (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) + 0.0
       |      AS p_hat
       |  FROM wide
       |  WHERE n1 IS NOT NULL AND n2 IS NOT NULL AND n1 >= 2 AND n2 >= 2),
       |zz AS (
       |  SELECT g, n_x, n_y, p_hat,
       |    round(CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE) * md2
       |      / ((CAST(n_x AS DOUBLE) + CAST(n_y AS DOUBLE))
       |      * nullif(sqrt(CAST(n_x AS DOUBLE) * v1d
       |      + CAST(n_y AS DOUBLE) * v2d), 0.0)), 4) + 0.0 AS w_bm,
       |    round((CAST(n_x AS DOUBLE) * v1d + CAST(n_y AS DOUBLE) * v2d)
       |      * (CAST(n_x AS DOUBLE) * v1d + CAST(n_y AS DOUBLE) * v2d)
       |      / nullif((CAST(n_x AS DOUBLE) * v1d) * (CAST(n_x AS DOUBLE)
       |      * v1d) / (CAST(n_x AS DOUBLE) - 1.0)
       |      + (CAST(n_y AS DOUBLE) * v2d) * (CAST(n_y AS DOUBLE) * v2d)
       |      / (CAST(n_y AS DOUBLE) - 1.0), 0.0), 4) + 0.0 AS df
       |  FROM forms)
       |SELECT g AS o_orderpriority, n_x, n_y, p_hat, w_bm, df,
       |  round($p, 6) + 0.0 AS p_value
       |FROM zz""".stripMargin
  }
}
