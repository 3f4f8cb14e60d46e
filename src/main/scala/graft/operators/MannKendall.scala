package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Mann–Kendall trend test per series — the nonparametric "is this
  * metric drifting" monitor: S = Σ_{i<j} sgn(x_j − x_i) over time-
  * ordered observations, variance with the exact tie correction,
  * normal approximation z with the ±1 continuity correction. The
  * monitoring-standard companion to q105 (CUSUM catches a level
  * SHIFT against a spec; MK detects a monotone TREND with no
  * distributional assumption), and the significance test behind
  * q102's Theil–Sen slope — run q102 over the same day cells for the
  * magnitude once MK flags direction.
  *
  * Semantics: observations are DAILY REVENUE CELLS (the q111/q116
  * time-bucket-first discipline — calendar-bounded series, and what a
  * trend chart plots); S over day pairs; ties in x: sgn = 0 and
  * var18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) (18·Var(S) — kept as the
  * exact INTEGER; the /18 happens inside the one shared-text z);
  * z = (S∓1)/√(var18/18), 0 when S = 0; |z| > 1.959964 → trend at
  * 5%.
  *
  * Exactness: day sums are exact cents, S / n / var18 pure BIGINT
  * (DECIMAL(38) products — n(n−1)(2n+5) overflows 2⁶³ past ~10⁶
  * buckets), z is ONE shared-text double from integers, rounded at 6.
  *
  * Plan/scale: fact scan → (series, day) cell aggregate (map-side
  * combined, calendar-bounded, checkpointed — the pair join reads it
  * twice and the tie/total aggregates once more) → day-pair self-join
  * whose fan-out is C(days, 2) per series (calendar², NOT data²) →
  * one aggregate; tie counts from a (series, value) cell aggregate.
  * No windows at all. Century-scale spans (36.5k days → ~6.6e8 pairs
  * per series) stay distributed-join work, but pre-bucket WEEKLY at
  * that range — MK is bucket-granularity-agnostic and the fan-out
  * drops 49×. That advice is ENFORCED, not advisory (r10 verdict #2):
  * past `maxBuckets` buckets in one series (default 2¹⁵ ≈ 90 years of
  * days → ~5.4e8 pairs, the edge of sane fan-out) the plan
  * raise_errors naming the fix, the q102 |cells|²-guard house style.
  */
object MannKendall {

  /** 1.959964 = Φ⁻¹(0.975) at the house 6-decimal snap. */
  val ZCrit = "1.959964"

  /** C(n,2) fan-out cap per series: 2¹⁵ buckets ≈ 90 years of days. */
  val DefaultMaxBuckets: Long = 1L << 15

  /** Per-group MK test over pre-bucketed integer observations
    * (`dayCol` integral bucket, `valueCol` exact integer). */
  def mkTest(cells0: DataFrame, groupCol: String, dayCol: String,
             valueCol: String,
             maxBuckets: Long = DefaultMaxBuckets): DataFrame = {
    val cellsRaw = cells0
      .selectExpr(s"$groupCol AS g", s"$dayCol AS d", s"$valueCol AS x")
      .localCheckpoint(true) // pair join (twice) + ties + totals
    // loud C(n,2) precondition: per-series bucket count as a distributed
    // aggregate broadcast back — fires while streaming into the pair
    // join, before any quadratic fan-out materializes
    val bucketCounts = cellsRaw.groupBy("g")
      .agg(count(lit(1)).as("__nbuckets"))
    val cells = cellsRaw.join(broadcast(bucketCounts), "g")
      .filter(expr(
        s"(CASE WHEN __nbuckets <= ${maxBuckets}L THEN TRUE ELSE" +
          " isnull(raise_error(concat('MannKendall.mkTest: ', CAST(__nbuckets AS STRING)," +
          s" ' time buckets in one series exceeds maxBuckets=$maxBuckets —" +
          " C(n,2) pair fan-out; pre-bucket coarser (weekly/monthly — MK is" +
          " bucket-granularity-agnostic) or raise maxBuckets'))) END)"))
      .drop("__nbuckets")
    val pairs = cells.selectExpr("g", "d AS d1", "x AS x1")
      .join(cells.selectExpr("g AS g2", "d AS d2", "x AS x2"),
        col("g") === col("g2") && col("d1") < col("d2"))
      .groupBy("g")
      .agg(expr("CAST(sum(sign(CAST(x2 AS DECIMAL(38,0)) - x1)) AS BIGINT)")
        .as("s_stat"))
    val ties = cells.groupBy("g", "x")
      .agg(expr("CAST(count(1) AS BIGINT)").as("t"))
      .groupBy("g")
      // n = Σt (bucket count) — count(1) here would count DISTINCT x
      // values, silently shrinking the variance (caught by the
      // analytic spec; the oracle twin mirrored the bug)
      .agg(expr("CAST(sum(t) AS BIGINT)").as("n_days"),
        expr("CAST(sum(CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5))" +
          " AS DECIMAL(38,0))").as("tie18"))
    val zExpr =
      "CASE WHEN s_stat > 0 THEN" +
        " (CAST(s_stat AS DOUBLE) - 1e0)" +
        " / sqrt(CAST(var18 AS DOUBLE) / 18e0)" +
        " WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1e0)" +
        " / sqrt(CAST(var18 AS DOUBLE) / 18e0)" +
        " ELSE 0e0 END"
    // LEFT from ties: a single-bucket series has NO pairs — it must
    // still report (S = 0, var18 = 0, no_trend), not silently vanish
    ties.join(pairs, Seq("g"), "left")
      .selectExpr("g", "n_days", "tie18",
        "coalesce(s_stat, CAST(0 AS BIGINT)) AS s_stat")
      .selectExpr("g", "n_days", "s_stat",
        "CAST(CAST(n_days AS DECIMAL(38,0)) * (n_days - 1)" +
          " * (2 * n_days + 5) - tie18 AS DECIMAL(38,0)) AS var18")
      .selectExpr("g", "n_days", "s_stat", "CAST(var18 AS BIGINT) AS var18",
        s"round($zExpr, 6) + 0.0 AS z")
      .selectExpr("g", "n_days", "s_stat", "var18", "z",
        s"CASE WHEN z > $ZCrit THEN 'increasing'" +
          s" WHEN z < -$ZCrit THEN 'decreasing'" +
          " ELSE 'no_trend' END AS trend")
  }

  /** q143: is daily order revenue trending, per order priority. */
  def orderRevenueTrend(spark: SparkSession, dir: String): DataFrame =
    mkTest(
      Tables.orders(spark, dir)
        .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull
          && col("o_orderpriority").isNotNull)
        .groupBy(col("o_orderpriority"),
          expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')")
            .as("day"))
        .agg(expr("CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT))" +
          " AS BIGINT)").as("rev_c")),
      "o_orderpriority", "day", "rev_c")
      .withColumnRenamed("g", "o_orderpriority")

  val orderRevenueTrendSql: String = {
    val zExpr =
      """CASE WHEN s_stat > 0 THEN
        |      (CAST(s_stat AS DOUBLE) - 1e0)
        |      / sqrt(CAST(var18 AS DOUBLE) / 18e0)
        |    WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1e0)
        |      / sqrt(CAST(var18 AS DOUBLE) / 18e0)
        |    ELSE 0e0 END""".stripMargin
    s"""WITH cells AS (
       |  SELECT o_orderpriority AS g,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
       |      AS d,
       |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT)
       |      AS x
       |  FROM orders
       |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
       |    AND o_orderpriority IS NOT NULL
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT a.g,
       |    CAST(sum(sign(CAST(b.x AS HUGEINT) - a.x)) AS BIGINT) AS s_stat
       |  FROM cells a JOIN cells b ON a.g = b.g AND a.d < b.d
       |  GROUP BY 1),
       |ties AS (
       |  SELECT g, CAST(sum(t) AS BIGINT) AS n_days,
       |    CAST(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS HUGEINT)
       |      AS tie18
       |  FROM (SELECT g, x, CAST(count(*) AS BIGINT) AS t
       |        FROM cells GROUP BY 1, 2)
       |  GROUP BY 1),
       |v AS (
       |  SELECT ties.g, n_days,
       |    CAST(coalesce(s_stat, 0) AS BIGINT) AS s_stat,
       |    CAST(CAST(n_days AS HUGEINT) * (n_days - 1) * (2 * n_days + 5)
       |      - tie18 AS HUGEINT) AS var18
       |  FROM ties LEFT JOIN pairs ON pairs.g = ties.g),
       |zz AS (
       |  SELECT g, n_days, s_stat, CAST(var18 AS BIGINT) AS var18,
       |    round($zExpr, 6) + 0.0 AS z
       |  FROM v)
       |SELECT g AS o_orderpriority, n_days, s_stat, var18, z,
       |  CASE WHEN z > $ZCrit THEN 'increasing'
       |    WHEN z < -$ZCrit THEN 'decreasing'
       |    ELSE 'no_trend' END AS trend
       |FROM zz""".stripMargin
  }
}
