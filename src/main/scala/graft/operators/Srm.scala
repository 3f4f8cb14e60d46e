package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Sample-ratio-mismatch guardrail (the experimentation-platform
  * staple — Fabijan et al. 2019 call it the most common failed
  * A/B-test diagnostic): a k-way split that CLAIMS equal allocation
  * is chi-square-GOF-tested against uniformity before anyone reads
  * treatment effects — assignment bugs, bot filtering, and lossy
  * logging all surface here first. This audits the engine's OWN
  * hash-threshold split machinery (the q38/q144/q156 discipline):
  * the registered query buckets order keys with the house hash and
  * asks whether the 10-way allocation is as uniform as every split
  * consumer assumes.
  *
  * EXACTNESS: with equal expected counts the GOF statistic CLEARS to
  * χ² = (k·ΣO² − N²)/N — exact DECIMAL(38,0) numerator, ONE
  * shared-text division (spec-pinned hand identity). Zero-count
  * buckets are REAL rows via the k-row spine (a silently missing
  * bucket is precisely the bug this test exists to catch). The tail
  * is the house χ² chain (q173): Wilson–Hilferty cube root snapped
  * 1e-9, rational z, A&S erfc upper tail.
  *
  * Plan/scale: ONE map-side-combined count aggregate over the fact
  * (k cells), broadcast spine fill, 1-row finish — scan-priced at
  * any corpus size. */
object Srm {

  /** Split arms. */
  val K = 10
  /** Hash family seed for the registered split. */
  val Seed = 250

  /** Chi-square GOF against the uniform k-split from observed bucket
    * counts (b, o); missing buckets are zero-filled from the spine.
    * Returns ONE row (n_rows, chi2_srm, z_wh, p_value). */
  def chiSquareUniform(counts: DataFrame, k: Int = K): DataFrame = {
    val spine = counts.sparkSession.range(k.toLong)
      .selectExpr("CAST(id AS BIGINT) AS b")
    spine.join(counts, Seq("b"), "left")
      .selectExpr("b", "coalesce(o, CAST(0 AS BIGINT)) AS o")
      .agg(expr("CAST(sum(o) AS BIGINT)").as("n"),
        expr("CAST(sum(CAST(o AS DECIMAL(38,0)) * o) AS DECIMAL(38,0))")
          .as("o2"))
      .selectExpr("n AS n_rows",
        s"round(CAST($k * o2 - CAST(n AS DECIMAL(38,0)) * n AS DOUBLE)" +
          " / nullif(CAST(n AS DOUBLE), 0e0), 4) + 0.0 AS chi2_srm")
      .selectExpr("n_rows", "chi2_srm",
        s"round(${ZSql(k - 1)}, 4) + 0.0 AS z_wh")
      .selectExpr("n_rows", "chi2_srm", "z_wh",
        s"round(${pUpperSql("z_wh")}, 6) + 0.0 AS p_value")
  }

  /** Wilson–Hilferty z for χ²_df from the round-4 statistic (the q173
    * chain: snapped cube root, rational z). */
  private def ZSql(df: Int): String = {
    val cb = s"(CAST(floor(pow(chi2_srm / $df.0," +
      " 0.3333333333333333) * 1e9 + 0.5) AS DOUBLE) / 1e9)"
    val mu = s"(1.0 - 2.0 / (9.0 * $df.0))"
    val sd = s"sqrt(2.0 / (9.0 * $df.0))"
    s"($cb - $mu) / $sd"
  }

  /** One-sided upper-tail normal p (A&S 7.1.26 erfc, q100 text). */
  private def pUpperSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val poly = s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741)" +
      s" * $u - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
    s"(CASE WHEN $z >= 0.0 THEN $poly / 2.0 ELSE 1.0 - $poly / 2.0 END)"
  }

  /** q250: is the house 10-way hash split of order keys uniform?
    * (The allocation every split consumer in the engine assumes.) */
  def orderSplitSrm(spark: SparkSession, dir: String): DataFrame =
    chiSquareUniform(Tables.orders(spark, dir)
      .select((Hashing.hash48(Seed, col("o_orderkey").cast("string"))
        % K).as("b"))
      .groupBy("b")
      .agg(expr("CAST(count(1) AS BIGINT)").as("o")))

  /** DuckDB twin: identical cleared integers and tail chain. */
  val orderSplitSrmSql: String = {
    val h = Hashing.hash48Sql(Seed, "(o_orderkey)::VARCHAR")
    val cb = s"(CAST(floor(pow(chi2_srm / ${K - 1}.0," +
      " 0.3333333333333333) * 1e9 + 0.5) AS DOUBLE) / 1e9)"
    val z = s"($cb - (1.0 - 2.0 / (9.0 * ${K - 1}.0)))" +
      s" / sqrt(2.0 / (9.0 * ${K - 1}.0))"
    s"""WITH counts AS (
       |  SELECT $h % $K AS b, CAST(count(*) AS BIGINT) AS o
       |  FROM orders GROUP BY 1),
       |filled AS (
       |  SELECT s.b, coalesce(o, CAST(0 AS BIGINT)) AS o
       |  FROM (SELECT range AS b FROM range($K)) s
       |  LEFT JOIN counts ON counts.b = s.b),
       |agg AS (
       |  SELECT CAST(sum(o) AS BIGINT) AS n,
       |    CAST(sum(CAST(o AS DECIMAL(38,0)) * o) AS DECIMAL(38,0)) AS o2
       |  FROM filled),
       |stat AS (
       |  SELECT n AS n_rows,
       |    round(CAST($K * o2 - CAST(n AS DECIMAL(38,0)) * n AS DOUBLE)
       |      / nullif(CAST(n AS DOUBLE), 0e0), 4) + 0.0 AS chi2_srm
       |  FROM agg),
       |zz AS (
       |  SELECT n_rows, chi2_srm, round($z, 4) + 0.0 AS z_wh FROM stat)
       |SELECT n_rows, chi2_srm, z_wh,
       |  round(${pUpperSql("z_wh")}, 6) + 0.0 AS p_value
       |FROM zz""".stripMargin
  }
}
