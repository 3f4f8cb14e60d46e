package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Friedman test — the BLOCKED rank design, completing the k-sample
  * deck: q98 compares k means (parametric), q176 ranks one pooled
  * sample (unordered), q175 orders the levels, and Friedman ranks the
  * k treatments WITHIN each block and asks whether the ranking is
  * consistent across blocks. The right tool when blocks differ wildly
  * in level (years differ in total revenue; what's stable is the
  * within-year ORDERING of the priorities) — pooling would let the
  * block effect swamp the treatment effect.
  *
  * Exactness: treatment values per block are exact integer cell sums;
  * within-block midranks come from block-local VALUE CELLS (the q97
  * doubled-rank trick per block: r2 = 2·cumBefore + n_cell + 1), so
  * each treatment's doubled rank total R2ⱼ = Σ_b r2 is an exact
  * BIGINT and ΣR2ⱼ² needs NO per-group floor at all (unlike q176's
  * ⌊R²/n⌋ — equal block counts divide out):
  *
  *   χ²_F = (3·ΣR2ⱼ²/(b·k·(k+1)) − 3·b·(k+1)) / C
  *   C    = 1 − Σ_blocks Σ(t³−t) / (b·k·(k²−1))
  *
  * ONE shared-text double from exact DECIMAL(38,0)/HUGEINT sums,
  * round-4 snapped; χ²_{k−1} tail via the q173 Wilson–Hilferty chain
  * (pow 1e-9-snapped, k < 2 guarded through the ANSI division path);
  * all-tied blocks drive C to exactly 0 → NULL via nullif. Only
  * COMPLETE blocks (all k treatments present) enter — the classical
  * design; dropped blocks are counted in the output (b_dropped).
  *
  * Plan/scale: one scan → one (block, treatment) cell aggregate
  * (calendar×level — dimension-grade BY CONSTRUCTION, the q100
  * class); everything after runs on that frame: block-local windows,
  * two small aggregates, a 1-row finish. */
object Friedman {

  /** Friedman χ²/p from a frame with (b, w, v): block key, treatment
    * key, exact integer value (one row per block×treatment; aggregate
    * upstream). Returns one row:
    * (n_blocks, b_dropped, k_levels, chi2_f, z_wh, p_value). */
  def friedman(cells: DataFrame): DataFrame = {
    val k = cells.agg(countDistinct(col("w")).as("k")).localCheckpoint(true)
    val complete = cells
      .filter(col("b").isNotNull && col("w").isNotNull && col("v").isNotNull)
      .withColumn("bk", count(lit(1)).over(Window.partitionBy(col("b"))))
      .crossJoin(broadcast(k))
      .localCheckpoint(true) // feeds the kept AND dropped branches
    val kept = complete.filter(col("bk") === col("k"))
    val dropped = complete.filter(col("bk") =!= col("k"))
      .agg(countDistinct(col("b")).as("b_dropped"))
    // block-local value cells → doubled midranks → join back
    val vcells = kept.groupBy("b", "v").agg(count(lit(1)).as("tj"))
    val wv = Window.partitionBy(col("b")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = vcells
      .withColumn("cb", coalesce(sum(col("tj")).over(wv), lit(0L)))
      .withColumn("r2", expr("2 * cb + tj + 1"))
      .select(col("b"), col("v"), col("r2"), col("tj"))
    val joined = kept.join(ranked, Seq("b", "v")).localCheckpoint(true)
    val rsums = joined.groupBy("w").agg(sum(col("r2")).as("r2j"))
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("k_levels"),
        expr("CAST(sum(CAST(r2j AS DECIMAL(38,0)) * r2j) AS DECIMAL(38,0))").as("s2"))
    val bstats = joined.select(col("b")).distinct()
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_blocks"))
    val ties = joined.select(col("b"), col("v"), col("tj")).distinct()
      .agg(expr("CAST(sum(CAST(tj AS DECIMAL(38,0)) * tj * tj - tj) AS DECIMAL(38,0))").as("tt"))
    bstats.crossJoin(broadcast(rsums)).crossJoin(broadcast(ties))
      .crossJoin(broadcast(dropped))
      .selectExpr("n_blocks", "b_dropped", "k_levels",
        "n_blocks AS b", "s2", "tt",
        s"round($ChiSql, 4) + 0.0 AS chi2_f")
      .selectExpr("n_blocks", "b_dropped", "k_levels", "chi2_f",
        s"round($ZSql, 4) + 0.0 AS z_wh")
      .selectExpr("n_blocks", "b_dropped", "k_levels", "chi2_f", "z_wh",
        s"round(${pUpperSql("z_wh")}, 6) + 0.0 AS p_value")
  }

  /** Shared-text tie-corrected χ²_F — NULL on b = 0, k < 2, or an
    * all-tied correction. */
  private val ChiSql = {
    val bd = "CAST(b AS DOUBLE)"
    val kd = "CAST(k_levels AS DOUBLE)"
    val raw = s"(3.0 * CAST(s2 AS DOUBLE) / ($bd * $kd * ($kd + 1.0))" +
      s" - 3.0 * $bd * ($kd + 1.0))"
    val corr = s"(1.0 - CAST(tt AS DOUBLE) / ($bd * $kd * ($kd * $kd - 1.0)))"
    s"(CASE WHEN b < 1 OR k_levels < 2 THEN NULL" +
      s" ELSE $raw / nullif($corr, 0.0) END)"
  }

  /** Wilson–Hilferty z at df = k − 1 (the q173 chain). */
  private val ZSql = {
    val df = "CAST(k_levels - 1 AS DOUBLE)"
    val cb = s"(CAST(floor(pow(chi2_f / $df," +
      " 0.3333333333333333) * 1e9 + 0.5) AS DOUBLE) / 1e9)"
    val mu = s"(1.0 - 2.0 / (9.0 * $df))"
    val sd = s"sqrt(2.0 / (9.0 * $df))"
    s"(CASE WHEN k_levels < 2 THEN NULL ELSE ($cb - $mu) / $sd END)"
  }

  /** One-sided upper-tail normal p via the A&S 7.1.26 erfc chain. */
  private def pUpperSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val poly = s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
    s"(CASE WHEN $z >= 0.0 THEN $poly / 2.0 ELSE 1.0 - $poly / 2.0 END)"
  }

  /** q177: do the five priorities keep the same within-year revenue
    * ORDERING across ship years? Blocks = order years, treatments =
    * priorities, value = exact cent revenue. */
  def priorityYearFriedman(spark: SparkSession, dir: String): DataFrame =
    friedman(Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_orderpriority").isNotNull
        && col("o_totalprice").isNotNull)
      .groupBy(expr("year(CAST(o_orderdate AS DATE))").as("b"),
        expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("w"))
      .agg(expr("CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT))" +
        " AS BIGINT)").as("v")))

  /** DuckDB twin: identical cells, block-local midranks, χ²/z/p. */
  val priorityYearFriedmanSql: String =
    s"""WITH cells0 AS (
       |  SELECT year(CAST(o_orderdate AS DATE)) AS b,
       |    CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w,
       |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS v
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
       |    AND o_totalprice IS NOT NULL
       |  GROUP BY 1, 2),
       |kk AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS k FROM cells0),
       |tagged AS (
       |  SELECT c.*, count(*) OVER (PARTITION BY b) AS bk, kk.k
       |  FROM cells0 c CROSS JOIN kk),
       |kept AS (SELECT * FROM tagged WHERE bk = k),
       |dropped AS (
       |  SELECT CAST(count(DISTINCT b) AS BIGINT) AS b_dropped
       |  FROM tagged WHERE bk <> k),
       |vcells AS (
       |  SELECT b, v, CAST(count(*) AS BIGINT) AS tj FROM kept GROUP BY 1, 2),
       |ranked AS (
       |  SELECT b, v, tj,
       |    2 * coalesce(CAST(sum(tj) OVER (PARTITION BY b ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |    + tj + 1 AS r2
       |  FROM vcells),
       |joined AS (
       |  SELECT k.b, k.w, k.v, r.r2, r.tj
       |  FROM kept k JOIN ranked r ON r.b = k.b AND r.v = k.v),
       |rsums AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k_levels,
       |    CAST(sum(CAST(r2j AS HUGEINT) * r2j) AS HUGEINT) AS s2
       |  FROM (SELECT w, CAST(sum(r2) AS BIGINT) AS r2j FROM joined GROUP BY 1)),
       |bstats AS (
       |  SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_blocks FROM joined),
       |ties AS (
       |  SELECT CAST(sum(CAST(tj AS HUGEINT) * tj * tj - tj) AS HUGEINT) AS tt
       |  FROM (SELECT DISTINCT b, v, tj FROM joined)),
       |chi AS (
       |  SELECT n_blocks, b_dropped, k_levels, n_blocks AS b, s2, tt,
       |    round($ChiSql, 4) + 0.0 AS chi2_f
       |  FROM bstats CROSS JOIN rsums CROSS JOIN ties CROSS JOIN dropped),
       |z AS (
       |  SELECT n_blocks, b_dropped, k_levels, chi2_f,
       |    round($ZSql, 4) + 0.0 AS z_wh
       |  FROM chi)
       |SELECT n_blocks, b_dropped, k_levels, chi2_f, z_wh,
       |  round(${pUpperSql("z_wh")}, 6) + 0.0 AS p_value
       |FROM z""".stripMargin
}
