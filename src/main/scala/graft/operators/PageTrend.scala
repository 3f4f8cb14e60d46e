package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Page's L trend test (Page 1963) — the ORDERED alternative in the
  * blocked-rank design, completing the family the same way q175
  * completes q176: Friedman (q177) asks "do the k treatments differ
  * in ordering AT ALL?" and burns k−1 df; when the alternative is
  * MONOTONE in a hypothesized treatment order ("revenue falls with
  * priority level"), Page's L = Σⱼ j·Rⱼ concentrates all its power on
  * that one direction — the blocked sibling of Jonckheere (q175),
  * whose pooled form a strong block effect would swamp.
  *
  * Exactness: within-block DOUBLED midranks (the q97/q177 trick, so
  * ties cost nothing) make L2 = Σ j·r2 an exact BIGINT; the null
  * moments CLEAR completely — E[L2] = b·k(k+1)²/2 is an exact integer
  * (k(k+1) is even) and the tie-corrected permutation variance
  *12·Var[L2] = k(k+1)·(S2 − b·k(k+1)²) with S2 = Σ r2² an exact
  * DECIMAL(38,0) (per-block Σr2 = k(k+1) ALWAYS, so the cross term is
  * a constant — the algebra is in the code); z is ONE shared-text
  * chain over exact integers, all-tied data self-cancels S2 to the
  * degenerate 0 → NULL via nullif. One-sided: large L = agreement
  * with the hypothesized order; z signed, p upper-tail (A&S erfc).
  * Only COMPLETE blocks enter (q177 convention), dropped counted.
  *
  * Plan/scale: the q177 plan verbatim — one (block, treatment) cell
  * aggregate (dimension-grade by construction), block-local windows,
  * a 1-row finish. */
object PageTrend {

  /** Page test from cells (b, w, v): block, treatment (the HYPOTHESIZED
    * order is ascending w), exact integer value. Returns ONE row:
    * (n_blocks, b_dropped, k_levels, l_stat, z, p_value). */
  def pageL(cells: DataFrame): DataFrame = {
    val k = cells.agg(countDistinct(col("w")).as("k")).localCheckpoint(true)
    val complete = cells
      .filter(col("b").isNotNull && col("w").isNotNull && col("v").isNotNull)
      .withColumn("bk", count(lit(1)).over(Window.partitionBy(col("b"))))
      .crossJoin(broadcast(k))
      .localCheckpoint(true) // kept + dropped branches
    val kept = complete.filter(col("bk") === col("k"))
    val dropped = complete.filter(col("bk") =!= col("k"))
      .agg(countDistinct(col("b")).as("b_dropped"))
    // hypothesized position j = dense rank of the treatment key
    val pos = kept.select("w").distinct()
      .withColumn("j", expr("dense_rank() OVER (ORDER BY w)"))
    // block-local value cells → doubled midranks → join back (q177)
    val vcells = kept.groupBy("b", "v").agg(count(lit(1)).as("tj"))
    val wv = Window.partitionBy(col("b")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = vcells
      .withColumn("cb", coalesce(sum(col("tj")).over(wv), lit(0L)))
      .withColumn("r2", expr("2 * cb + tj + 1"))
      .select(col("b"), col("v"), col("r2"))
    val joined = kept.join(ranked, Seq("b", "v"))
      .join(broadcast(pos), "w")
    val stats = joined.agg(
      expr("CAST(sum(CAST(j AS DECIMAL(38,0)) * r2) AS DECIMAL(38,0))")
        .as("l2"),
      expr("CAST(sum(CAST(r2 AS DECIMAL(38,0)) * r2) AS DECIMAL(38,0))")
        .as("s2"),
      expr("CAST(count(DISTINCT b) AS BIGINT)").as("n_blocks"),
      expr("CAST(max(k) AS BIGINT)").as("k_levels"))
    stats.crossJoin(broadcast(dropped))
      .selectExpr("n_blocks", "b_dropped", "k_levels", "l2", "s2",
        // E[L2] = b·k(k+1)²/2 (integer); 12·Var = k(k+1)(S2 − b·k(k+1)²)
        "n_blocks * k_levels * (k_levels + 1) * (k_levels + 1)" +
          " div 2 AS el2",
        "s2 - n_blocks * k_levels * (k_levels + 1) * (k_levels + 1)" +
          " AS vcore")
      .selectExpr("n_blocks", "b_dropped", "k_levels",
        "round(CAST(l2 AS DOUBLE) / 2.0, 4) + 0.0 AS l_stat",
        s"round($ZSql, 4) + 0.0 AS z")
      .selectExpr("n_blocks", "b_dropped", "k_levels", "l_stat", "z",
        s"round(${pUpperSql("z")}, 6) + 0.0 AS p_value")
  }

  /** Shared-text z = (L2 − E[L2]) / √(k(k+1)·vcore/12); degenerate
    * (all-tied: vcore = 0) and k < 2 → NULL. */
  private val ZSql =
    "(CASE WHEN k_levels < 2 OR n_blocks < 1 THEN NULL ELSE" +
      " (CAST(l2 AS DOUBLE) - CAST(el2 AS DOUBLE))" +
      " / nullif(sqrt(CAST(k_levels AS DOUBLE)" +
      " * (CAST(k_levels AS DOUBLE) + 1.0)" +
      " * CAST(vcore AS DOUBLE) / 12.0), 0.0) END)"

  /** One-sided upper-tail normal p (A&S 7.1.26 erfc, q100 text). */
  private def pUpperSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val poly = s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741)" +
      s" * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
    s"(CASE WHEN $z >= 0.0 THEN $poly / 2.0 ELSE 1.0 - $poly / 2.0 END)"
  }

  /** q254: does within-year revenue rise MONOTONICALLY down the
    * priority order? — the directed question q177 answers undirected,
    * on the EXACT q177 cells (blocks = order years, treatments =
    * priority 1-URGENT..5-LOW in label order). */
  def priorityYearPage(spark: SparkSession, dir: String): DataFrame =
    pageL(Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_orderpriority").isNotNull
        && col("o_totalprice").isNotNull)
      .groupBy(expr("year(CAST(o_orderdate AS DATE))").as("b"),
        expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("w"))
      .agg(expr("CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT))" +
        " AS BIGINT)").as("v")))

  /** DuckDB twin: identical cells, midranks, cleared moments. */
  val priorityYearPageSql: String =
    s"""WITH cells AS (
       |  SELECT year(CAST(o_orderdate AS DATE)) AS b,
       |    CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w,
       |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS v
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
       |    AND o_totalprice IS NOT NULL
       |  GROUP BY 1, 2),
       |kk AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS k FROM cells),
       |complete AS (
       |  SELECT c.*, k,
       |    count(*) OVER (PARTITION BY b) AS bk
       |  FROM cells c CROSS JOIN kk),
       |kept AS (SELECT * FROM complete WHERE bk = k),
       |dropped AS (
       |  SELECT CAST(count(DISTINCT b) AS BIGINT) AS b_dropped
       |  FROM complete WHERE bk <> k),
       |pos AS (
       |  SELECT w, dense_rank() OVER (ORDER BY w) AS j
       |  FROM (SELECT DISTINCT w FROM kept)),
       |vcells AS (
       |  SELECT b, v, count(*) AS tj FROM kept GROUP BY 1, 2),
       |ranked AS (
       |  SELECT b, v,
       |    2 * coalesce(sum(tj) OVER (PARTITION BY b ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    + tj + 1 AS r2
       |  FROM vcells),
       |joined AS (
       |  SELECT kept.b, r2, j, k
       |  FROM kept JOIN ranked ON kept.b = ranked.b AND kept.v = ranked.v
       |  JOIN pos ON kept.w = pos.w),
       |stats AS (
       |  SELECT
       |    CAST(sum(CAST(j AS DECIMAL(38,0)) * r2) AS DECIMAL(38,0)) AS l2,
       |    CAST(sum(CAST(r2 AS DECIMAL(38,0)) * r2) AS DECIMAL(38,0)) AS s2,
       |    CAST(count(DISTINCT b) AS BIGINT) AS n_blocks,
       |    CAST(max(k) AS BIGINT) AS k_levels
       |  FROM joined),
       |forms AS (
       |  SELECT n_blocks, b_dropped, k_levels, l2, s2,
       |    n_blocks * k_levels * (k_levels + 1) * (k_levels + 1) // 2 AS el2,
       |    s2 - n_blocks * k_levels * (k_levels + 1) * (k_levels + 1) AS vcore
       |  FROM stats CROSS JOIN dropped),
       |zz AS (
       |  SELECT n_blocks, b_dropped, k_levels,
       |    round(CAST(l2 AS DOUBLE) / 2.0, 4) + 0.0 AS l_stat,
       |    round($ZSql, 4) + 0.0 AS z
       |  FROM forms)
       |SELECT n_blocks, b_dropped, k_levels, l_stat, z,
       |  round(${pUpperSql("z")}, 6) + 0.0 AS p_value
       |FROM zz""".stripMargin
}
