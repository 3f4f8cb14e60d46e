package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Dunn's post-hoc pairwise rank test — the follow-up q176 cannot
  * answer: Kruskal–Wallis says "SOME level differs"; Dunn (1964) says
  * WHICH pairs, with every pair read against the POOLED midranks and
  * the pooled tie-corrected variance (NOT per-pair reranking — that
  * is pairwise Mann–Whitney, a different and non-comparable test),
  * Bonferroni-adjusted over the k(k−1)/2 family:
  *
  *   z_ij = (R̄ᵢ − R̄ⱼ) / √(σ²·(1/nᵢ + 1/nⱼ)),
  *   σ² = N(N+1)/12 − T/(12(N−1)),  T = Σ(t³ − t)
  *
  * Exactness: the q97/q176 doubled-midrank cells make every level's
  * rank sum R2ᵢ an exact BIGINT and T an exact DECIMAL(38,0); each
  * pair's z is ONE shared-text double chain from those integers —
  * nothing snapped, nothing summed as a double.
  *
  * Plan/scale: the q176 plan verbatim (one cell aggregate, one
  * value-grid-bounded midrank window, one keyed level aggregate) →
  * the |k|-row level frame checkpointed and self-crossed broadcast
  * for the pair grid — pairs never touch fact rows. */
object Dunn {

  /** Pooled tie-corrected rank variance (shared text). */
  private val S2Sql = {
    val nd = "CAST(n AS DOUBLE)"
    s"($nd * ($nd + 1.0) / 12.0 - CAST(tt AS DOUBLE)" +
      s" / (12.0 * ($nd - 1.0)))"
  }

  /** Pairwise z from doubled rank sums (shared text; the /2 undoes
    * the doubled-rank scale). NULL when the tie correction kills σ²
    * (all values identical). */
  private val ZSql =
    "((CAST(r2a AS DOUBLE) / CAST(na AS DOUBLE)" +
      " - CAST(r2b AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0" +
      s" / sqrt(nullif($S2Sql * (1.0 / CAST(na AS DOUBLE)" +
      " + 1.0 / CAST(nb AS DOUBLE)), 0.0)))"

  /** Two-sided normal p via A&S 7.1.26 (the q94/q100 chain). */
  private def pSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u" +
      s" - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
  }

  /** Dunn pairs from a frame with (w, v): integer level and exact
    * integer value (optionally pre-quantized by gridDiv — the q176
    * knob). One row per unordered pair (w_a < w_b): (w_a, w_b, n_a,
    * n_b, z_dunn, p_value, p_bonf). */
  def dunnTest(rows: DataFrame, gridDiv: Long = 1L): DataFrame = {
    val cells = rows
      .filter(col("w").isNotNull && col("v").isNotNull)
      .selectExpr("w", s"v div $gridDiv AS g")
      .groupBy("w", "g")
      .agg(expr("CAST(count(1) AS BIGINT)").as("c"))
      .localCheckpoint(true) // tie cells AND level rank sums read it
    val tieCells = cells.groupBy("g").agg(sum(col("c")).as("tj"))
      .localCheckpoint(true) // midranks AND the tie term read it
    val wv = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val rankedValues = tieCells
      .withColumn("cb", coalesce(sum(col("tj")).over(wv), lit(0L)))
      .withColumn("r2", expr("2 * cb + tj + 1"))
      .select(col("g"), col("r2"))
    val levels = cells.join(rankedValues, "g")
      .groupBy("w")
      .agg(expr("CAST(sum(c) AS BIGINT)").as("ni"),
        expr("CAST(sum(c * r2) AS BIGINT)").as("r2i"))
      .localCheckpoint(true) // both sides of the pair grid read it
    val globals = levels.agg(
      expr("CAST(sum(ni) AS BIGINT)").as("n"),
      expr("CAST(count(1) AS BIGINT)").as("k_levels"))
      .crossJoin(broadcast(tieCells.agg(
        expr("CAST(sum(CAST(tj AS DECIMAL(38,0)) * tj * tj - tj)" +
          " AS DECIMAL(38,0))").as("tt"))))
    levels.selectExpr("w AS w_a", "ni AS na", "r2i AS r2a")
      .crossJoin(broadcast(
        levels.selectExpr("w AS w_b", "ni AS nb", "r2i AS r2b")))
      .filter(col("w_a") < col("w_b"))
      .crossJoin(broadcast(globals))
      .selectExpr("w_a", "w_b", "na AS n_a", "nb AS n_b", "k_levels",
        s"round($ZSql, 4) + 0.0 AS z_dunn")
      .selectExpr("w_a", "w_b", "n_a", "n_b", "k_levels",
        "z_dunn", s"round(${pSql("z_dunn")}, 6) + 0.0 AS p_value")
      .selectExpr("w_a", "w_b", "n_a", "n_b", "z_dunn", "p_value",
        "round(least(CAST(1.0 AS DOUBLE), p_value" +
          " * CAST(k_levels * (k_levels - 1) div 2 AS DOUBLE)), 6)" +
          " + 0.0 AS p_bonf")
  }

  /** q206: WHICH priority pairs differ in order value — the post-hoc
    * q176 leaves open, on the identical frame (cents, hundred-dollar
    * grid). */
  def priorityValueDunn(spark: SparkSession, dir: String): DataFrame =
    dunnTest(Tables.orders(spark, dir)
      .filter(col("o_orderpriority").isNotNull
        && col("o_totalprice").isNotNull)
      .selectExpr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w",
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS v"),
      gridDiv = 10000L)

  /** DuckDB twin: the q176 cells/midranks verbatim, then the pair
    * grid and shared z/p/Bonferroni chain. */
  val priorityValueDunnSql: String =
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
       |levels AS (
       |  SELECT w, CAST(sum(c) AS BIGINT) AS ni,
       |    CAST(sum(c * r2) AS BIGINT) AS r2i
       |  FROM cells JOIN rankedvalues USING (g) GROUP BY 1),
       |globals AS (
       |  SELECT (SELECT CAST(sum(ni) AS BIGINT) FROM levels) AS n,
       |    (SELECT CAST(count(*) AS BIGINT) FROM levels) AS k_levels,
       |    (SELECT CAST(sum(CAST(tj AS HUGEINT) * tj * tj - tj) AS HUGEINT)
       |     FROM tiecells) AS tt),
       |pairs AS (
       |  SELECT a.w AS w_a, b.w AS w_b, a.ni AS na, b.ni AS nb,
       |    a.r2i AS r2a, b.r2i AS r2b, n, k_levels, tt
       |  FROM levels a CROSS JOIN levels b CROSS JOIN globals
       |  WHERE a.w < b.w),
       |zs AS (
       |  SELECT w_a, w_b, na AS n_a, nb AS n_b, k_levels,
       |    round($ZSql, 4) + 0.0 AS z_dunn
       |  FROM pairs),
       |ps AS (
       |  SELECT w_a, w_b, n_a, n_b, k_levels, z_dunn,
       |    round(${pSql("z_dunn")}, 6) + 0.0 AS p_value
       |  FROM zs)
       |SELECT w_a, w_b, n_a, n_b, z_dunn, p_value,
       |  round(least(CAST(1.0 AS DOUBLE), p_value
       |    * CAST(k_levels * (k_levels - 1) // 2 AS DOUBLE)), 6)
       |  + 0.0 AS p_bonf
       |FROM ps""".stripMargin
}
