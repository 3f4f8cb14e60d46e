package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Fleiss' kappa — chance-corrected agreement for MANY raters: q136's
  * Cohen kappa compares exactly two raters; Fleiss (1971) scores N
  * subjects each rated by a fixed n raters into k categories — the
  * standard "do annotators agree beyond chance?" number for any
  * label-quality audit with more than two annotators per item.
  *
  *   P̄  = (ΣᵢΣⱼ nᵢⱼ² − N·n) / (N·n·(n−1))    (mean pairwise agreement)
  *   P̄ₑ = Σⱼ cⱼ² / (N·n)²                     (chance agreement)
  *   κ  = (P̄ − P̄ₑ) / (1 − P̄ₑ)
  *
  * Exactness: because every subject shares the SAME rater count n,
  * the whole statistic collapses to THREE integers per group — S2 =
  * ΣΣnᵢⱼ² (BIGINT), C2 = Σcⱼ² (DECIMAL(38,0) — cⱼ is N·n-scale and
  * its square passes 2⁶³ long before 100 TB), and N — plus the
  * constant n; κ is ONE shared-text rational chain, nothing snapped,
  * bitwise equal across engines. Subjects whose rating count ≠ n are
  * EXCLUDED (the Fleiss precondition, made explicit and spec-pinned).
  *
  * Plan/scale: one corpus-touch aggregate to (group, subject,
  * category) cells → a subject-keyed aggregate (map-side combined;
  * the rater-count filter rides it) → one keyed finish per group for
  * S2 and one for C2 over the checkpointed kept-cells frame — no
  * windows, no fact joins. */
object FleissKappa {

  private val PBarSql =
    "((CAST(s2 AS DOUBLE) - CAST(n_subjects AS DOUBLE) * nr)" +
      " / (CAST(n_subjects AS DOUBLE) * nr * (nr - 1.0)))"
  private val PESql =
    "(CAST(c2 AS DOUBLE) / (CAST(n_subjects AS DOUBLE) * nr" +
      " * CAST(n_subjects AS DOUBLE) * nr))"

  /** Fleiss' kappa per group from a frame of individual ratings
    * (g, subj, cat) with a required per-subject rater count n. One
    * row per group: (g, n_subjects, n_raters, k_categories, p_bar,
    * p_e, kappa) — NULL kappa when chance agreement is 1 (one
    * category only); groups with no complete subject are dropped. */
  def fleissKappa(ratings: DataFrame, n: Int): DataFrame = {
    val cells = ratings.groupBy("g", "subj", "cat")
      .agg(expr("CAST(count(1) AS BIGINT)").as("nij"))
    val kept = cells
      .withColumn("tot", expr(
        "sum(nij) OVER (PARTITION BY g, subj)")) // subject-grade window
      .filter(col("tot") === n.toLong)
      .localCheckpoint(true) // S2 and C2 both read it
    val s2 = kept.groupBy("g").agg(
      expr("CAST(count(DISTINCT subj) AS BIGINT)").as("n_subjects"),
      expr("CAST(sum(nij * nij) AS BIGINT)").as("s2"))
    val c2 = kept.groupBy("g", "cat")
      .agg(expr("CAST(sum(nij) AS BIGINT)").as("cj"))
      .groupBy("g").agg(
        expr("CAST(count(1) AS BIGINT)").as("k_categories"),
        expr("CAST(sum(CAST(cj AS DECIMAL(38,0)) * cj) AS DECIMAL(38,0))")
          .as("c2"))
    s2.join(c2, "g")
      .withColumn("nr", lit(n.toDouble))
      .selectExpr("g", "n_subjects",
        s"CAST($n AS BIGINT) AS n_raters", "k_categories",
        s"round($PBarSql, 6) + 0.0 AS p_bar",
        s"round($PESql, 6) + 0.0 AS p_e",
        s"round(($PBarSql - $PESql) / nullif(1.0 - $PESql, 0.0), 6)" +
          " + 0.0 AS kappa")
  }

  /** Required lines per order for the registered query. */
  val OrderLines = 4

  /** q205: do the lines of one order AGREE on return status beyond
    * chance, per priority — subjects = orders with exactly
    * [[OrderLines]] lines, raters = the lines, categories =
    * l_returnflag. The orders join is key-bounded (≤ 7 lines). */
  def orderFlagKappa(spark: SparkSession, dir: String): DataFrame =
    fleissKappa(
      Tables.lineitem(spark, dir)
        .filter(col("l_returnflag").isNotNull)
        .select("l_orderkey", "l_returnflag")
        .join(Tables.orders(spark, dir)
            .filter(col("o_orderpriority").isNotNull)
            .select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .selectExpr("o_orderpriority AS g", "l_orderkey AS subj",
          "l_returnflag AS cat"),
      OrderLines)
      .withColumnRenamed("g", "o_orderpriority")

  /** DuckDB twin: identical cells, completeness filter, three-integer
    * finish. */
  val orderFlagKappaSql: String = {
    val n = OrderLines
    s"""WITH base AS (
       |  SELECT o_orderpriority AS g, l_orderkey AS subj,
       |    l_returnflag AS cat
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_returnflag IS NOT NULL AND o_orderpriority IS NOT NULL),
       |cells AS (
       |  SELECT g, subj, cat, CAST(count(*) AS BIGINT) AS nij
       |  FROM base GROUP BY 1, 2, 3),
       |kept AS (
       |  SELECT * FROM (
       |    SELECT *, sum(nij) OVER (PARTITION BY g, subj) AS tot
       |    FROM cells)
       |  WHERE tot = $n),
       |s2 AS (
       |  SELECT g, CAST(count(DISTINCT subj) AS BIGINT) AS n_subjects,
       |    CAST(sum(nij * nij) AS BIGINT) AS s2
       |  FROM kept GROUP BY 1),
       |c2 AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS k_categories,
       |    CAST(sum(CAST(cj AS HUGEINT) * cj) AS HUGEINT) AS c2
       |  FROM (SELECT g, cat, CAST(sum(nij) AS BIGINT) AS cj
       |        FROM kept GROUP BY 1, 2)
       |  GROUP BY 1),
       |fin AS (
       |  SELECT g, n_subjects, s2.s2, c2.c2, k_categories,
       |    CAST($n AS DOUBLE) AS nr
       |  FROM s2 JOIN c2 USING (g))
       |SELECT g AS o_orderpriority, n_subjects,
       |  CAST($n AS BIGINT) AS n_raters, k_categories,
       |  round($PBarSql, 6) + 0.0 AS p_bar,
       |  round($PESql, 6) + 0.0 AS p_e,
       |  round(($PBarSql - $PESql) / nullif(1.0 - $PESql, 0.0), 6)
       |    + 0.0 AS kappa
       |FROM fin""".stripMargin
  }
}
