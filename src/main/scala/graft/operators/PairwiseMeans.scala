package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** All-pairs mean contrasts with FDR control — the post-hoc step
  * after q98's ANOVA: the F statistic says "SOME group differs", the
  * pairwise table says WHICH, and without multiplicity control a
  * 25-group scan manufactures "significant" pairs from pure noise
  * (300 tests at α=0.05 expect 15 false flags). Welch-z contrasts
  * per unordered pair + q100's Benjamini–Hochberg step-up over the
  * whole family — the q96 two-group test industrialized to every
  * pair and corrected as one family.
  *
  * Exactness: per-group (n, Σv, Σv²) as exact integers (cents);
  * z = Δmean / √(s²ᵢ/nᵢ + s²ⱼ/nⱼ) with s² in the cleared form
  * (n·q − s²)/(n·(n−1)) off DECIMAL(38) products — one shared-text
  * IEEE chain, round-4 snap, then the shared A–S erfc p and BH
  * machinery ([[Hypothesis.bhAdjust]] verbatim — same window rules,
  * ties by pair key). Degenerate pairs (either side n < 2 or zero
  * variance on both sides) yield NULL z and are EXCLUDED from the
  * family (q100's NULL rule) — m counts real tests only.
  *
  * Plan/scale: one map-side-combined cell aggregate (one row per
  * group), a broadcast self-join of the group-dimension frame
  * (C(G,2) pairs — dimension-squared, never fact-sized), and q100's
  * two family-sized global windows. The fact is scanned once.
  */
object PairwiseMeans {

  /** Pairwise Welch-z frame (pair, z) + BH over the family. */
  def pairwiseMeans(df: DataFrame, groupCol: String, valueCol: String,
                    scale: String = "1e2"): DataFrame = {
    val cells = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"),
        expr(s"CAST(floor($valueCol * $scale) AS BIGINT)").as("v"))
      .groupBy("g")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n"),
        expr("CAST(sum(v) AS BIGINT)").as("s"),
        expr("CAST(sum(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0))")
          .as("q"))
      .localCheckpoint(true) // group-dimension; both sides of the pair join
    def side(tag: String) = cells.selectExpr(s"g AS g_$tag",
      s"CAST(n AS DOUBLE) AS n$tag", s"CAST(s AS DOUBLE) AS s$tag",
      s"CAST(q AS DOUBLE) AS q$tag")
    def varTerm(t: String) =
      s"((n$t * q$t - s$t * s$t) / (n$t * (n$t - 1.0))) / n$t"
    val pairs = broadcast(side("i"))
      .join(broadcast(side("j")), col("g_i") < col("g_j"))
      .selectExpr("concat(g_i, '|', g_j) AS pair",
        "CASE WHEN ni >= 2.0 AND nj >= 2.0 THEN" +
          s" round((si / ni - sj / nj)" +
          s" / nullif(sqrt(${varTerm("i")} + ${varTerm("j")}), 0e0), 4) + 0.0" +
          " END AS z")
    Hypothesis.bhAdjust(pairs, "pair", "z")
  }

  /** q138: which nation pairs differ in mean account balance (an
    * all-noise family — BH should clear nearly everything). */
  def nationBalancePairs(spark: SparkSession, dir: String): DataFrame =
    pairwiseMeans(
      Tables.customer(spark, dir)
        .select(col("c_nationkey").cast("string").as("nation"),
          col("c_acctbal")),
      "nation", "c_acctbal")

  val nationBalancePairsSql: String = {
    def p(z: String) = {
      val x = s"(abs($z) / 1.4142135623730951)"
      val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
      s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u" +
        s" - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
    }
    def varTerm(t: String) =
      s"((n$t * q$t - s$t * s$t) / (n$t * (n$t - 1.0))) / n$t"
    val bhRaw = "p_raw * CAST(m_tests AS DOUBLE) / CAST(rank_p AS DOUBLE)"
    s"""WITH cells AS (
       |  SELECT CAST(c_nationkey AS VARCHAR) AS g,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(floor(c_acctbal * 1e2) AS BIGINT)) AS BIGINT) AS s,
       |    CAST(sum(CAST(CAST(floor(c_acctbal * 1e2) AS BIGINT) AS HUGEINT)
       |      * CAST(floor(c_acctbal * 1e2) AS BIGINT)) AS HUGEINT) AS q
       |  FROM customer WHERE c_nationkey IS NOT NULL AND c_acctbal IS NOT NULL
       |  GROUP BY 1),
       |pairs AS (
       |  SELECT i.g || '|' || j.g AS pair,
       |    CASE WHEN CAST(i.n AS DOUBLE) >= 2.0
       |      AND CAST(j.n AS DOUBLE) >= 2.0 THEN
       |      round((CAST(i.s AS DOUBLE) / CAST(i.n AS DOUBLE)
       |          - CAST(j.s AS DOUBLE) / CAST(j.n AS DOUBLE))
       |        / nullif(sqrt(${varTerm("i2")} + ${varTerm("j2")}), 0e0), 4) + 0.0
       |      END AS z
       |  FROM (SELECT g, CAST(n AS DOUBLE) AS ni2, CAST(s AS DOUBLE) AS si2,
       |          CAST(q AS DOUBLE) AS qi2, n, s FROM cells) i
       |  JOIN (SELECT g, CAST(n AS DOUBLE) AS nj2, CAST(s AS DOUBLE) AS sj2,
       |          CAST(q AS DOUBLE) AS qj2, n, s FROM cells) j
       |    ON i.g < j.g),
       |withp AS (
       |  SELECT pair, z, ${p("z")} AS p_raw FROM pairs WHERE z IS NOT NULL),
       |ranked AS (
       |  SELECT pair, z, p_raw,
       |    CAST(count(*) OVER () AS BIGINT) AS m_tests,
       |    CAST(row_number() OVER (ORDER BY p_raw, pair) AS BIGINT) AS rank_p
       |  FROM withp),
       |mins AS (
       |  SELECT ranked.*,
       |    min($bhRaw) OVER (ORDER BY p_raw DESC, pair DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_bh_min
       |  FROM ranked)
       |SELECT pair, z,
       |  round(p_raw, 6) + 0.0 AS p_norm,
       |  rank_p,
       |  round(least(p_bh_min, 1e0), 6) + 0.0 AS p_bh
       |FROM mins""".stripMargin
  }
}
