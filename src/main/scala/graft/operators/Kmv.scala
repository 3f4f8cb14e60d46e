package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{BottomK, Hashing}

/** KMV (k-minimum-values) distinct sketch (Bar-Yossef et al. 2002) —
  * the third member of the sketch deck's cardinality family and the
  * one with a capability HLL cannot offer: the kept bottom-k hash set
  * is simultaneously (a) a distinct-count estimator — if the kth
  * smallest of n uniform hashes sits at h₍k₎, then n ≈ (k−1)/u₍k₎ —
  * and (b) a UNIFORM SAMPLE OF THE DISTINCT KEY POPULATION, because
  * the k hash-smallest keys are a simple random sample of the
  * distinct keys (the hash is the randomness). That sample answers
  * per-distinct-key questions ("mean lines per distinct order") with
  * a k-row broadcast semijoin instead of the full distinct shuffle —
  * the estimator HLL registers destroy the keys for.
  *
  * State: a k-entry sorted DISTINCT array per group on every map task
  * ([[graft.functions.expressions.KmvBottomK]]) regardless of row
  * count; partials merge by re-insertion — order-free AND
  * redelivery-idempotent (the HLL register contract; contrast the
  * CountMin/DDSketch additive twins). Standard error ≈ 1/√(k−2)
  * (≈ 6.3% at k = 256 — deliberately matched to q245's m = 256 HLL
  * so the two estimators' bands are comparable on the SAME frame).
  *
  * EXACTNESS: the sketch consumes the IDENTICAL [[Hashing.hash48]]
  * stream q245 hashes (same key text), the kept set equals the
  * oracle's `row_number() OVER (ORDER BY h) <= k` selection over the
  * deduplicated hashes (spec-pinned), and the estimate is one
  * shared-text chain: u₍k₎ = (h₍k₎+1)/2⁴⁸ so est = [[EstNum]]/(h₍k₎+1)
  * with 255·2⁴⁸ pinned as ONE exponent-notation double literal (the
  * q245 NumSql lesson). A group with fewer than k distinct keys holds
  * its whole key set — the CASE returns the exact size. Hash ties
  * (48-bit collisions) collapse identically in both engines because
  * both dedup on h before ranking.
  */
object Kmv {

  /** Sketch capacity (and the q245 register-count twin). */
  val K = 256

  /** (K−1)·2⁴⁸ = 255·2⁴⁸, pinned as one exponent-notation double
    * literal (exact: 8 significant bits · 2⁴⁸). */
  val EstNum = "7.177611906121728e16"

  /** Bottom-k-distinct per group from rows (g, h): (g, hs ascending,
    * sz, hk) with hk = the kth minimum (NULL until the group reaches
    * capacity). ONE map-side-combined aggregate, k longs of state. */
  def bottomK(rows: DataFrame, k: Int = K): DataFrame =
    rows.groupBy("g")
      .agg(BottomK.kmvBottomK(col("h"), k).as("hs"))
      .selectExpr("g", "hs", "CAST(size(hs) AS BIGINT) AS sz",
        s"CASE WHEN size(hs) >= $k THEN element_at(hs, $k) END AS hk")

  /** q264: KMV distinct order keys per return flag on lineitem — the
    * q245 frame run through the sketch family's sample-capable member,
    * with BOTH audits beside it: rel_err of the cardinality estimate
    * (q245's deliverable, same hash stream, same error band), and the
    * distinct-population mean "lines per distinct order" estimated
    * from the k-key sample vs computed exactly. */
  def orderkeyKmv(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag AS g", "CAST(l_orderkey AS STRING) AS k")
      .withColumn("h", Hashing.hash48(col("k")))
      // three consumers (sketch, exact audit, sample semijoin):
      // checkpoint so the scan+hash subtree runs once
      .localCheckpoint(true)
    val sk = bottomK(keyed.select("g", "h")).localCheckpoint(true) // 3 rows
    val exact = keyed.groupBy("g")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_lines"),
        expr("CAST(count(DISTINCT k) AS BIGINT)").as("n_exact"))
    val sampleKeys = sk.select(col("g"), explode(col("hs")).as("h"))
    val samp = keyed.join(broadcast(sampleKeys), Seq("g", "h"))
      .groupBy("g")
      .agg(expr("CAST(count(1) AS BIGINT)").as("s_lines"),
        expr("CAST(count(DISTINCT k) AS BIGINT)").as("s_orders"))
    sk.join(exact, "g").join(samp, "g")
      .selectExpr("g", "n_exact", "n_lines", "s_lines", "s_orders",
        s"CASE WHEN sz < $K THEN CAST(sz AS DOUBLE)" +
          s" ELSE $EstNum / (CAST(hk AS DOUBLE) + 1.0) END AS est_raw")
      .selectExpr("g AS l_returnflag", "n_exact",
        "round(est_raw, 4) + 0.0 AS kmv_estimate",
        "round((est_raw - n_exact) / n_exact, 6) + 0.0 AS rel_err",
        "round(CAST(n_lines AS DOUBLE) / CAST(n_exact AS DOUBLE), 6) + 0.0 AS lines_mean_exact",
        "round(CAST(s_lines AS DOUBLE) / CAST(s_orders AS DOUBLE), 6) + 0.0 AS lines_mean_kmv")
  }

  /** DuckDB twin: identical hash stream, the kept set as the ranked
    * selection over deduplicated hashes, identical shared-text
    * estimate and sample means. */
  val orderkeyKmvSql: String =
    s"""WITH keyed AS (
       |  SELECT l_returnflag AS g, CAST(l_orderkey AS VARCHAR) AS k,
       |    ${Hashing.hash48Sql("CAST(l_orderkey AS VARCHAR)")} AS h
       |  FROM lineitem),
       |hs AS (SELECT g, h FROM keyed GROUP BY 1, 2),
       |ranked AS (
       |  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS r
       |  FROM hs),
       |bk AS (SELECT g, h FROM ranked WHERE r <= $K),
       |kth AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS sz,
       |    CASE WHEN count(*) >= $K THEN max(h) END AS hk
       |  FROM bk GROUP BY 1),
       |ex AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_lines,
       |    CAST(count(DISTINCT k) AS BIGINT) AS n_exact
       |  FROM keyed GROUP BY 1),
       |samp AS (
       |  SELECT keyed.g, CAST(count(*) AS BIGINT) AS s_lines,
       |    CAST(count(DISTINCT k) AS BIGINT) AS s_orders
       |  FROM keyed JOIN bk ON keyed.g = bk.g AND keyed.h = bk.h
       |  GROUP BY 1),
       |est AS (
       |  SELECT kth.g, n_exact, n_lines, s_lines, s_orders,
       |    CASE WHEN sz < $K THEN CAST(sz AS DOUBLE)
       |      ELSE $EstNum / (CAST(hk AS DOUBLE) + 1.0) END AS est_raw
       |  FROM kth JOIN ex ON kth.g = ex.g
       |  JOIN samp ON kth.g = samp.g)
       |SELECT g AS l_returnflag, n_exact,
       |  round(est_raw, 4) + 0.0 AS kmv_estimate,
       |  round((est_raw - n_exact) / n_exact, 6) + 0.0 AS rel_err,
       |  round(CAST(n_lines AS DOUBLE) / CAST(n_exact AS DOUBLE), 6) + 0.0 AS lines_mean_exact,
       |  round(CAST(s_lines AS DOUBLE) / CAST(s_orders AS DOUBLE), 6) + 0.0 AS lines_mean_kmv
       |FROM est""".stripMargin
}
