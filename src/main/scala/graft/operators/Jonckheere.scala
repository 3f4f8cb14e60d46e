package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Jonckheere–Terpstra trend test — "does a CONTINUOUS outcome move
  * monotonically with an ordered exposure level?" Completes the
  * ordered-alternative pair: q168 (Cochran–Armitage) is the binary-
  * outcome rung, this is the continuous one; q98's ANOVA treats the
  * same levels as unordered (burning k−1 df), q97 compares exactly
  * two. J = Σ_{i<j} #(x in level i < y in level j) — Mann–Whitney
  * counts summed over ordered level pairs — which dominates ANOVA
  * against monotone alternatives for the same reason q168 dominates
  * q91.
  *
  * Exactness: values are floored onto an integer grid (`gridDiv` —
  * the tie midcount + tie-corrected variance absorb the quantization,
  * the q170 stance); DOUBLED J is an exact BIGINT:
  * J2 = Σ_cells c·(2·A + B) with A = lower-level mass strictly below
  * the cell's value and B = lower-level mass AT it. The null moments
  * come from three exact integer sufficient-statistic pairs (group
  * sizes / tie sizes): mean2 = (n² − Σnᵢ²)/2 and
  *
  *   4·Var = T1/18 + S_b·T_b/(9·n(n−1)(n−2)) + S_c·T_c/(2·n(n−1))
  *   T1 = n(n−1)(2n+5) − Σnᵢ(nᵢ−1)(2nᵢ+5) − Σtⱼ(tⱼ−1)(2tⱼ+5)
  *
  * (Hollander–Wolfe tie-corrected form) — every S/T is an exact
  * DECIMAL(38,0)/HUGEINT sum, the three-term Var is ONE shared-text
  * double, z = (J2 − mean2)/√(4·Var) round-4 snapped, then the A&S
  * erfc p (q100 convention). Var ≤ 0 → NULL via nullif.
  *
  * Plan/scale: one scan → one (level, value-cell) aggregate; the
  * below/at masses come from ONE window over the per-level value-cell
  * frame (k·grid cells — each level's cumulated frame is bounded by
  * the quantized value range, the q48/q83 class) fed by a broadcast
  * level×level fan-out (k² rows — levels are dimension-grade BY
  * DESIGN); the cells frame is materialized once (consumed by the
  * fan-out, the group sizes, and the tie sizes). */
object Jonckheere {

  /** J–T z/p from a frame with (w, v): integer level score and exact
    * integer value. Returns one row:
    * (n_total, k_levels, j2_stat, z_jt, p_value). */
  def jonckheere(rows: DataFrame, gridDiv: Long = 1L): DataFrame = {
    val spark = rows.sparkSession
    val cells = rows
      .filter(col("w").isNotNull && col("v").isNotNull)
      .selectExpr("w", s"v div $gridDiv AS g")
      .groupBy("w", "g")
      .agg(expr("CAST(count(1) AS BIGINT)").as("c"))
      .localCheckpoint(true) // consumed by fan-out + group sizes + tie sizes
    val levels = cells.select(col("w").as("w2")).distinct()
    // contributor mass of every LOWER level, folded under each target
    // level w2; target cells ride the same frame with tag t
    val contrib = cells.join(broadcast(levels), col("w") < col("w2"))
      .select(col("w2").as("wt"), col("g"), col("c").as("cc"), lit(0L).as("tc"))
    val targets = cells
      .select(col("w").as("wt"), col("g"), lit(0L).as("cc"), col("c").as("tc"))
    val merged = contrib.union(targets)
      .groupBy("wt", "g")
      .agg(sum(col("cc")).as("cc"), sum(col("tc")).as("tc"))
    val wv = Window.partitionBy(col("wt")).orderBy(col("g"))
    val j2Row = merged
      .withColumn("below2", coalesce(sum(col("cc")).over(
        wv.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) * 2 + col("cc"))
      .agg(sum(expr("tc * below2")).as("j2"))
    val groupStats = cells.groupBy("w")
      .agg(sum(col("c")).as("ni"))
      .agg(
        expr("CAST(sum(ni) AS BIGINT)").as("n"),
        expr("CAST(count(1) AS BIGINT)").as("k_levels"),
        expr("CAST(sum(CAST(ni AS DECIMAL(38,0)) * ni) AS DECIMAL(38,0))").as("sq"),
        expr("CAST(sum(CAST(ni AS DECIMAL(38,0)) * (ni - 1) * (2 * ni + 5)) AS DECIMAL(38,0))").as("sa"),
        expr("CAST(sum(CAST(ni AS DECIMAL(38,0)) * (ni - 1) * (ni - 2)) AS DECIMAL(38,0))").as("sb"),
        expr("CAST(sum(CAST(ni AS DECIMAL(38,0)) * (ni - 1)) AS DECIMAL(38,0))").as("sc"))
    val tieStats = cells.groupBy("g")
      .agg(sum(col("c")).as("tj"))
      .agg(
        expr("CAST(sum(CAST(tj AS DECIMAL(38,0)) * (tj - 1) * (2 * tj + 5)) AS DECIMAL(38,0))").as("ta"),
        expr("CAST(sum(CAST(tj AS DECIMAL(38,0)) * (tj - 1) * (tj - 2)) AS DECIMAL(38,0))").as("tb"),
        expr("CAST(sum(CAST(tj AS DECIMAL(38,0)) * (tj - 1)) AS DECIMAL(38,0))").as("tcs"))
    j2Row.crossJoin(broadcast(groupStats)).crossJoin(broadcast(tieStats))
      .selectExpr("n AS n_total", "k_levels", "CAST(j2 AS BIGINT) AS j2_stat",
        "CAST(2 * j2 AS DECIMAL(38,0)) - (CAST(n AS DECIMAL(38,0)) * n - sq) AS t2num",
        "CAST(n AS DECIMAL(38,0)) * (n - 1) * (2 * n + 5) - sa - ta AS t1",
        "n", "sb", "sc", "tb", "tcs")
      .selectExpr("n_total", "k_levels", "j2_stat",
        s"round($ZSql, 4) + 0.0 AS z_jt")
      .selectExpr("n_total", "k_levels", "j2_stat", "z_jt",
        s"round(${pSql("z_jt")}, 6) + 0.0 AS p_value")
  }

  /** Shared-text z = (J2 − mean2)/√(4Var); t2num carries 2·J2 − 2·mean2
    * so the chain divides by 2 once. NULL when Var ≤ 0. */
  private val ZSql = {
    val nd = "CAST(n AS DOUBLE)"
    val term1 = "CAST(t1 AS DOUBLE) / 18.0"
    val term2 = "(CASE WHEN CAST(sb AS DOUBLE) * CAST(tb AS DOUBLE) = 0.0 THEN 0.0" +
      s" ELSE CAST(sb AS DOUBLE) * CAST(tb AS DOUBLE) / (9.0 * $nd * ($nd - 1.0) * ($nd - 2.0)) END)"
    val term3 = s"CAST(sc AS DOUBLE) * CAST(tcs AS DOUBLE) / (2.0 * $nd * ($nd - 1.0))"
    s"(CAST(t2num AS DOUBLE) / 2.0) / sqrt(nullif($term1 + $term2 + $term3, 0.0))"
  }

  /** Two-sided normal p via A&S 7.1.26 (the q100 shared chain). */
  private def pSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
  }

  /** q175: does order VALUE trend with priority (1-URGENT … 5-LOW
    * scored 1..5)? Cents on a hundred-dollar grid. */
  def priorityValueTrend(spark: SparkSession, dir: String): DataFrame =
    jonckheere(Tables.orders(spark, dir)
      .filter(col("o_orderpriority").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w",
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS v"),
      gridDiv = 10000L)

  /** DuckDB twin: identical cells, fan-out, window, and z/p chain. */
  val priorityValueTrendSql: String =
    s"""WITH rows_ AS (
       |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w,
       |    CAST(floor(o_totalprice * 100) AS BIGINT) // 10000 AS g
       |  FROM orders
       |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
       |cells AS (
       |  SELECT w, g, CAST(count(*) AS BIGINT) AS c FROM rows_ GROUP BY 1, 2),
       |levels AS (SELECT DISTINCT w AS w2 FROM cells),
       |merged AS (
       |  SELECT wt, g, CAST(sum(cc) AS BIGINT) AS cc,
       |    CAST(sum(tc) AS BIGINT) AS tc
       |  FROM (
       |    SELECT l.w2 AS wt, c.g, c.c AS cc, 0 AS tc
       |    FROM cells c JOIN levels l ON c.w < l.w2
       |    UNION ALL
       |    SELECT w AS wt, g, 0 AS cc, c AS tc FROM cells)
       |  GROUP BY 1, 2),
       |j2row AS (
       |  SELECT CAST(sum(tc * below2) AS BIGINT) AS j2 FROM (
       |    SELECT tc,
       |      coalesce(CAST(sum(cc) OVER (PARTITION BY wt ORDER BY g
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |      * 2 + cc AS below2
       |    FROM merged)),
       |gstats AS (
       |  SELECT CAST(sum(ni) AS BIGINT) AS n,
       |    CAST(count(*) AS BIGINT) AS k_levels,
       |    CAST(sum(CAST(ni AS HUGEINT) * ni) AS HUGEINT) AS sq,
       |    CAST(sum(CAST(ni AS HUGEINT) * (ni - 1) * (2 * ni + 5)) AS HUGEINT) AS sa,
       |    CAST(sum(CAST(ni AS HUGEINT) * (ni - 1) * (ni - 2)) AS HUGEINT) AS sb,
       |    CAST(sum(CAST(ni AS HUGEINT) * (ni - 1)) AS HUGEINT) AS sc
       |  FROM (SELECT w, CAST(sum(c) AS BIGINT) AS ni FROM cells GROUP BY 1)),
       |tstats AS (
       |  SELECT
       |    CAST(sum(CAST(tj AS HUGEINT) * (tj - 1) * (2 * tj + 5)) AS HUGEINT) AS ta,
       |    CAST(sum(CAST(tj AS HUGEINT) * (tj - 1) * (tj - 2)) AS HUGEINT) AS tb,
       |    CAST(sum(CAST(tj AS HUGEINT) * (tj - 1)) AS HUGEINT) AS tcs
       |  FROM (SELECT g, CAST(sum(c) AS BIGINT) AS tj FROM cells GROUP BY 1)),
       |packed AS (
       |  SELECT n AS n_total, k_levels, j2 AS j2_stat,
       |    CAST(2 * CAST(j2 AS HUGEINT) AS HUGEINT)
       |      - (CAST(n AS HUGEINT) * n - sq) AS t2num,
       |    CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5) - sa - ta AS t1,
       |    n, sb, sc, tb, tcs
       |  FROM j2row CROSS JOIN gstats CROSS JOIN tstats),
       |z AS (
       |  SELECT n_total, k_levels, j2_stat,
       |    round($ZSql, 4) + 0.0 AS z_jt
       |  FROM packed)
       |SELECT n_total, k_levels, j2_stat, z_jt,
       |  round(${pSql("z_jt")}, 6) + 0.0 AS p_value
       |FROM z""".stripMargin
}
