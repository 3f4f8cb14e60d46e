package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Brown–Forsythe (median-based Levene) test — equality of SPREAD
  * across k groups, the diagnostic q98's ANOVA and q96's Welch t
  * quietly hinge on: ANOVA compares means ASSUMING equal variances;
  * BF tests that assumption itself, robustly (the median center makes
  * it resistant to the heavy tails that break classical Levene —
  * the same robustness move as q71's MAD).
  *
  * Statistic: z_ij = |x_ij − med_j|, then the one-way ANOVA F on the
  * z's: W = [Σ n_j(z̄_j − z̄)²/(k−1)] / [Σ(z − z̄_j)²/(N−k)],
  * W ~ F(k−1, N−k) under H₀.
  *
  * Exactness: medians on the q71 2×-integer-cent grid (midpoints of
  * even integers interpolate EXACTLY in both engines — bit-identical
  * medians, no snap); z's are exact integral doubles cast back to
  * BIGINT; the ANOVA decomposition uses the q98 sufficient-stat
  * floors (per-group ⌊S²/n⌋ snapped in DECIMAL(38,0), order-free);
  * W is ONE shared-text double. The tail is reported on the large-N
  * route: (k−1)·W → χ²_{k−1} via the q173 Wilson–Hilferty chain —
  * exact as N→∞ and indistinguishable from F at fact-table
  * denominators (df₂ in the thousands); df₂ ships in the output so a
  * small-N caller can see when the approximation is doing work.
  *
  * Plan/scale: one checkpointed projection → per-group median fit
  * (dimension-grade, broadcast back — exact `percentile` per the q71
  * adjudication; swap approx_percentile at fact-scale group counts) →
  * one keyed sufficient-stat aggregate → a 1-row finish. */
object Levene {

  /** Brown–Forsythe from a frame with (g, x2): group key and values on
    * the 2× integer grid. Returns one row:
    * (k_groups, n_rows, df2, w_stat, z_wh, p_value). */
  def brownForsythe(values: DataFrame): DataFrame = {
    val base = values.select("g", "x2").localCheckpoint(true)
    val med = base.groupBy("g").agg(expr("percentile(x2, 0.5)").as("med2"))
    val grp = base.join(broadcast(med), "g")
      .withColumn("z", expr("CAST(abs(x2 - med2) AS BIGINT)"))
      .groupBy("g")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_g"),
        expr("CAST(sum(CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("s_g"),
        expr("CAST(sum(CAST(z AS DECIMAL(38,0)) * z) AS DECIMAL(38,0))")
          .as("q_g"))
      .withColumn("b_g", expr(
        "CAST(floor(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)" +
          " / nullif(CAST(n_g AS DOUBLE), 0e0)) AS DECIMAL(38,0))"))
    grp.agg(
      expr("CAST(count(1) AS BIGINT)").as("k_groups"),
      expr("CAST(sum(n_g) AS BIGINT)").as("n_rows"),
      expr("CAST(sum(s_g) AS DECIMAL(38,0))").as("s_all"),
      expr("CAST(sum(q_g) AS DECIMAL(38,0))").as("q_all"),
      expr("CAST(sum(b_g) AS DECIMAL(38,0))").as("b_all"))
      .selectExpr("k_groups", "n_rows", "n_rows - k_groups AS df2",
        "CAST(n_rows AS DOUBLE) AS nd", "CAST(k_groups AS DOUBLE) AS kd",
        "CAST(s_all AS DOUBLE) AS sd", "CAST(q_all AS DOUBLE) AS qd",
        "CAST(b_all AS DOUBLE) AS bd")
      .selectExpr("k_groups", "n_rows", "df2", "kd",
        s"round($WSql, 4) + 0.0 AS w_stat")
      .selectExpr("k_groups", "n_rows", "df2", "w_stat",
        s"round($ZSql, 4) + 0.0 AS z_wh")
      .selectExpr("k_groups", "n_rows", "df2", "w_stat", "z_wh",
        s"round(${pUpperSql("z_wh")}, 6) + 0.0 AS p_value")
  }

  /** Shared-text W — the q98 decomposition on the z's. */
  private val WSql = {
    val ssb = "greatest(bd - sd * sd / nullif(nd, 0e0), 0e0)"
    val ssw = "greatest(qd - bd, 0e0)"
    s"(CASE WHEN k_groups < 2 THEN NULL ELSE ($ssb / nullif(kd - 1e0, 0e0))" +
      s" / nullif($ssw / nullif(nd - kd, 0e0), 0e0) END)"
  }

  /** Wilson–Hilferty z for (k−1)·W at df = k−1 (the q173 chain) —
    * the large-df₂ tail. */
  private val ZSql = {
    val df = "CAST(k_groups - 1 AS DOUBLE)"
    val cb = s"(CAST(floor(pow((kd - 1.0) * w_stat / $df," +
      " 0.3333333333333333) * 1e9 + 0.5) AS DOUBLE) / 1e9)"
    val mu = s"(1.0 - 2.0 / (9.0 * $df))"
    val sd = s"sqrt(2.0 / (9.0 * $df))"
    s"(CASE WHEN k_groups < 2 THEN NULL ELSE ($cb - $mu) / $sd END)"
  }

  /** One-sided upper-tail normal p via the A&S 7.1.26 erfc chain. */
  private def pUpperSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val poly = s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
    s"(CASE WHEN $z >= 0.0 THEN $poly / 2.0 ELSE 1.0 - $poly / 2.0 END)"
  }

  /** q182: does order-value SPREAD differ across the five priorities?
    * (q98 already compares their means — this is its guard.) */
  def priorityValueSpread(spark: SparkSession, dir: String): DataFrame =
    brownForsythe(Tables.orders(spark, dir)
      .filter(col("o_orderpriority").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("o_orderpriority AS g",
        "CAST(round(o_totalprice * 100) AS BIGINT) * 2 AS x2"))

  /** DuckDB twin: identical grid, medians, floors, and chain. */
  val priorityValueSpreadSql: String = {
    val kd = "CAST(k_groups AS DOUBLE)"
    s"""WITH base AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(round(o_totalprice * 100) AS BIGINT) * 2 AS x2
       |  FROM orders
       |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
       |med AS (
       |  SELECT g, quantile_cont(x2, 0.5) AS med2 FROM base GROUP BY 1),
       |grp AS (
       |  SELECT base.g,
       |    CAST(count(*) AS BIGINT) AS n_g,
       |    CAST(sum(CAST(CAST(abs(x2 - med2) AS BIGINT) AS HUGEINT))
       |      AS HUGEINT) AS s_g,
       |    CAST(sum(CAST(CAST(abs(x2 - med2) AS BIGINT) AS HUGEINT)
       |      * CAST(abs(x2 - med2) AS BIGINT)) AS HUGEINT) AS q_g
       |  FROM base JOIN med ON base.g = med.g GROUP BY 1),
       |grp2 AS (
       |  SELECT grp.*,
       |    CAST(floor(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
       |      / nullif(CAST(n_g AS DOUBLE), 0e0)) AS HUGEINT) AS b_g
       |  FROM grp),
       |tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k_groups,
       |    CAST(sum(n_g) AS BIGINT) AS n_rows,
       |    CAST(sum(s_g) AS HUGEINT) AS s_all,
       |    CAST(sum(q_g) AS HUGEINT) AS q_all,
       |    CAST(sum(b_g) AS HUGEINT) AS b_all
       |  FROM grp2),
       |recovered AS (
       |  SELECT k_groups, n_rows, n_rows - k_groups AS df2,
       |    CAST(n_rows AS DOUBLE) AS nd, $kd AS kd,
       |    CAST(s_all AS DOUBLE) AS sd, CAST(q_all AS DOUBLE) AS qd,
       |    CAST(b_all AS DOUBLE) AS bd
       |  FROM tot),
       |wrow AS (
       |  SELECT k_groups, n_rows, df2, kd, round($WSql, 4) + 0.0 AS w_stat
       |  FROM recovered),
       |z AS (
       |  SELECT k_groups, n_rows, df2, w_stat, round($ZSql, 4) + 0.0 AS z_wh
       |  FROM wrow)
       |SELECT k_groups, n_rows, df2, w_stat, z_wh,
       |  round(${pUpperSql("z_wh")}, 6) + 0.0 AS p_value
       |FROM z""".stripMargin
  }
}
