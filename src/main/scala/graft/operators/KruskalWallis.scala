package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Kruskal–Wallis H test — the k-sample RANK analogue of q98's ANOVA:
  * q97 compares two samples on ranks, q98 compares k means assuming
  * variance structure, this compares k samples on ranks with no
  * normality assumption. Beside q175 it is the UNORDERED companion —
  * J–T spends its power on the level ordering, KW asks only "do the
  * level distributions differ at all?" (run both: KW significant but
  * JT not ⇒ the levels differ non-monotonically).
  *
  * Exactness: global tie midranks over VALUE CELLS (2·avgRank =
  * 2·cumBefore + n_cell + 1 — the q97 doubled-rank trick), so each
  * group's doubled rank sum R2ᵢ = Σ c·r2 is an exact BIGINT. The
  * between-group mass enters as per-group ⌊R2ᵢ²/nᵢ⌋ snapped to an
  * integer (the q98 SSB move at 1-unit² resolution, DECIMAL(38,0)/
  * HUGEINT — R2ᵢ² reaches n⁴), summed order-free; then
  *
  *   H = (3·Σ⌊R2ᵢ²/nᵢ⌋/(n(n+1)) − 3(n+1)) / (1 − T/(n³−n))
  *
  * is ONE shared-text double (3 = 12/4 absorbs the doubled scale),
  * round-4 snapped; the χ²_{k−1} tail via the q173 Wilson–Hilferty
  * cube-root chain (pow output 1e-9-snapped) and the A&S erfc upper
  * tail. All-tied data drives the correction to exactly 1 − 1 = 0 →
  * NULL via nullif.
  *
  * Plan/scale: one scan → one (level, value-cell) aggregate
  * (checkpointed — feeds the global tie cells AND the per-level rank
  * sums); midranks from one window over the distinct-value frame
  * (bounded by the `gridDiv`-quantized value range, the q48/q83
  * class) + one equi-join back; two dimension-grade aggregates; one
  * 1-row finish. */
object KruskalWallis {

  /** KW H/p from a frame with (w, v): group key (any integer) and
    * exact integer value. Returns one row:
    * (n_total, k_levels, h_stat, z_wh, p_value). */
  def kruskalWallis(rows: DataFrame, gridDiv: Long = 1L): DataFrame = {
    val cells = rows
      .filter(col("w").isNotNull && col("v").isNotNull)
      .selectExpr("w", s"v div $gridDiv AS g")
      .groupBy("w", "g")
      .agg(expr("CAST(count(1) AS BIGINT)").as("c"))
      .localCheckpoint(true) // feeds tie cells AND per-level rank sums
    val tieCells = cells.groupBy("g").agg(sum(col("c")).as("tj"))
    val wv = Window.orderBy(col("g")).rowsBetween(Window.unboundedPreceding, -1)
    val rankedValues = tieCells
      .withColumn("cb", coalesce(sum(col("tj")).over(wv), lit(0L)))
      .withColumn("r2", expr("2 * cb + tj + 1"))
      .select(col("g"), col("r2"))
    val groupStats = cells.join(rankedValues, "g")
      .groupBy("w")
      .agg(sum(col("c")).as("ni"),
        sum(expr("c * r2")).as("r2i"))
      .agg(
        expr("CAST(sum(ni) AS BIGINT)").as("n"),
        expr("CAST(count(1) AS BIGINT)").as("k_levels"),
        expr("CAST(sum(CAST(r2i AS DECIMAL(38,0)) * r2i div ni) AS DECIMAL(38,0))").as("sb"))
    val tieStats = tieCells.agg(
      expr("CAST(sum(CAST(tj AS DECIMAL(38,0)) * tj * tj - tj) AS DECIMAL(38,0))").as("tt"))
    groupStats.crossJoin(broadcast(tieStats))
      .selectExpr("n AS n_total", "k_levels", "n", "sb", "tt",
        s"round($HSql, 4) + 0.0 AS h_stat")
      .selectExpr("n_total", "k_levels", "h_stat",
        s"round($ZSql, 4) + 0.0 AS z_wh")
      .selectExpr("n_total", "k_levels", "h_stat", "z_wh",
        s"round(${pUpperSql("z_wh")}, 6) + 0.0 AS p_value")
  }

  /** Shared-text tie-corrected H — NULL when the correction hits 0
    * (all values tied) or k = 1. */
  private val HSql = {
    val nd = "CAST(n AS DOUBLE)"
    val raw = s"(3.0 * CAST(sb AS DOUBLE) / ($nd * ($nd + 1.0)) - 3.0 * ($nd + 1.0))"
    val corr = s"(1.0 - CAST(tt AS DOUBLE) / ($nd * $nd * $nd - $nd))"
    s"(CASE WHEN k_levels < 2 THEN NULL ELSE $raw / nullif($corr, 0.0) END)"
  }

  /** Wilson–Hilferty z from the round-4 H at df = k − 1 (the q173
    * chain: cube root snapped to 1e-9, rational finish). */
  private val ZSql = {
    val df = "CAST(k_levels - 1 AS DOUBLE)"
    val cb = s"(CAST(floor(pow(h_stat / $df," +
      " 0.3333333333333333) * 1e9 + 0.5) AS DOUBLE) / 1e9)"
    val mu = s"(1.0 - 2.0 / (9.0 * $df))"
    val sd = s"sqrt(2.0 / (9.0 * $df))"
    // the k < 2 guard short-circuits the df = 0 divisions (ANSI)
    s"(CASE WHEN k_levels < 2 THEN NULL ELSE ($cb - $mu) / $sd END)"
  }

  /** One-sided upper-tail normal p via the A&S 7.1.26 erfc chain. */
  private def pUpperSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val poly = s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
    s"(CASE WHEN $z >= 0.0 THEN $poly / 2.0 ELSE 1.0 - $poly / 2.0 END)"
  }

  /** q176: do order values DIFFER across the five priorities at all?
    * The unordered companion of q175, on the same frame (cents,
    * hundred-dollar grid). */
  def priorityValueKw(spark: SparkSession, dir: String): DataFrame =
    kruskalWallis(Tables.orders(spark, dir)
      .filter(col("o_orderpriority").isNotNull && col("o_totalprice").isNotNull)
      .selectExpr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w",
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS v"),
      gridDiv = 10000L)

  /** DuckDB twin: identical cells, midranks, snapped between-group
    * mass, and H/z/p chain. */
  val priorityValueKwSql: String =
    s"""WITH rows_ AS (
       |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w,
       |    CAST(floor(o_totalprice * 100) AS BIGINT) // 10000 AS g
       |  FROM orders
       |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
       |cells AS (
       |  SELECT w, g, CAST(count(*) AS BIGINT) AS c FROM rows_ GROUP BY 1, 2),
       |tiecells AS (
       |  SELECT g, CAST(sum(c) AS BIGINT) AS tj FROM cells GROUP BY 1),
       |rankedvalues AS (
       |  SELECT g,
       |    2 * coalesce(CAST(sum(tj) OVER (ORDER BY g
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |    + tj + 1 AS r2
       |  FROM tiecells),
       |gstats AS (
       |  SELECT CAST(sum(ni) AS BIGINT) AS n,
       |    CAST(count(*) AS BIGINT) AS k_levels,
       |    CAST(sum(CAST(r2i AS HUGEINT) * r2i // ni) AS HUGEINT) AS sb
       |  FROM (
       |    SELECT w, CAST(sum(c) AS BIGINT) AS ni,
       |      CAST(sum(c * r2) AS BIGINT) AS r2i
       |    FROM cells JOIN rankedvalues USING (g) GROUP BY 1)),
       |tstats AS (
       |  SELECT CAST(sum(CAST(tj AS HUGEINT) * tj * tj - tj) AS HUGEINT) AS tt
       |  FROM tiecells),
       |h AS (
       |  SELECT n AS n_total, k_levels, n, sb, tt,
       |    round($HSql, 4) + 0.0 AS h_stat
       |  FROM gstats CROSS JOIN tstats),
       |z AS (
       |  SELECT n_total, k_levels, h_stat, round($ZSql, 4) + 0.0 AS z_wh
       |  FROM h)
       |SELECT n_total, k_levels, h_stat, z_wh,
       |  round(${pUpperSql("z_wh")}, 6) + 0.0 AS p_value
       |FROM z""".stripMargin
}
