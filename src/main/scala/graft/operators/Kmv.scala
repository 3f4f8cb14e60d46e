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

  // -------------- q270: KMV set algebra (theta-sketch intersection) --------------

  /** Shared estimate text off a (sz, hk) pair. */
  private def estSql(sz: String, hk: String): String =
    s"CASE WHEN $sz < $K THEN CAST($sz AS DOUBLE)" +
      s" ELSE $EstNum / (CAST($hk AS DOUBLE) + 1.0) END"

  /** q270: distinct-key JACCARD and intersection between groups from
    * sketches alone — the theta-sketch move (Dasgupta et al. 2016)
    * KMV enables and HLL cannot: because the sketch RETAINS sample
    * hashes, two sketches compose exactly —
    *
    *   U_k = bottom-k(bk(A) ∪ bk(B))  ≡  bottom-k(A ∪ B)   (the KMV
    *   merge law: each of the union's k smallest is among its own
    *   set's k smallest — so merging the two 2 KiB sketches equals
    *   re-sketching the full union, spec-pinned),
    *
    *   Ĵ = |{h ∈ U_k : h ∈ bk(A) ∧ h ∈ bk(B)}| / |U_k|  (the union
    *   sample is uniform over A ∪ B; membership in both sketches is
    *   decidable AT SKETCH LEVEL for exactly these hashes),
    *
    *   |A ∩ B| ≈ Ĵ · est(U_k).
    *
    * q262 estimated overlap by HLL inclusion–exclusion, which
    * AMPLIFIES error (three estimates differenced); the KMV route is
    * one ratio of exact small counts times one estimate — and it
    * yields Jaccard directly, the quantity the dedup deck thresholds
    * on. The exact audit rides beside it (q262 doctrine), computed
    * via |A∩B| = n_a + n_b − |A∪B| so the truth path needs no
    * pair-join either. */
  def flagJaccardKmv(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag AS g", "CAST(l_orderkey AS STRING) AS k")
      .withColumn("h", Hashing.hash48(col("k")))
      .select("g", "h")
    val dh = keyed.distinct().localCheckpoint(true) // exact audit base
    val sk = bottomK(dh).localCheckpoint(true)      // 3 sketch rows
    val pairs = sk.selectExpr("g AS ga", "hs AS ha")
      .join(sk.selectExpr("g AS gb", "hs AS hb"), col("ga") < col("gb"))
      .withColumn("uhs", slice(array_sort(array_union(col("ha"), col("hb"))), 1, K))
      .selectExpr("ga", "gb",
        "CAST(size(uhs) AS BIGINT) AS szu",
        s"CASE WHEN size(uhs) >= $K THEN element_at(uhs, $K) END AS hku",
        "CAST(size(array_intersect(array_intersect(uhs, ha), hb)) AS BIGINT) AS n_both")
    val cnt = dh.groupBy("g").agg(expr("CAST(count(1) AS BIGINT)").as("n_g"))
    val inter = dh.selectExpr("g AS ga", "h")
      .join(dh.selectExpr("g AS gb", "h"), Seq("h"))
      .filter(col("ga") < col("gb"))
      .groupBy("ga", "gb")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_int"))
    pairs
      .join(broadcast(cnt.selectExpr("g AS ga", "n_g AS n_a")), "ga")
      .join(broadcast(cnt.selectExpr("g AS gb", "n_g AS n_b")), "gb")
      .join(broadcast(inter), Seq("ga", "gb"), "left")
      .selectExpr("ga", "gb", "szu", "hku", "n_both", "n_a", "n_b",
        "coalesce(n_int, CAST(0 AS BIGINT)) AS n_int")
      .selectExpr("ga", "gb", "n_int", "n_a + n_b - n_int AS n_union",
        "CAST(n_both AS DOUBLE) / nullif(CAST(szu AS DOUBLE), 0e0) AS jacc_raw",
        s"${estSql("szu", "hku")} AS est_u")
      .selectExpr("ga AS flag_a", "gb AS flag_b", "n_int AS n_int_exact",
        "n_union AS n_union_exact",
        "round(CAST(n_int AS DOUBLE) / nullif(CAST(n_union AS DOUBLE), 0e0), 6) + 0.0 AS jacc_exact",
        "round(jacc_raw, 6) + 0.0 AS jacc_kmv",
        "round(jacc_raw * est_u, 4) + 0.0 AS int_kmv",
        "round(jacc_raw - CAST(n_int AS DOUBLE) / nullif(CAST(n_union AS DOUBLE), 0e0), 6) + 0.0 AS err_jacc")
  }

  /** DuckDB twin: per-flag ranked sketches, the pair union sketch
    * recomputed from the FULL deduplicated hash set (≡ the Spark
    * side's sketch merge by the KMV merge law), identical shared
    * estimate/ratio text. */
  val flagJaccardKmvSql: String =
    s"""WITH keyed AS (
       |  SELECT l_returnflag AS g,
       |    ${Hashing.hash48Sql("CAST(l_orderkey AS VARCHAR)")} AS h
       |  FROM lineitem),
       |dh AS (SELECT g, h FROM keyed GROUP BY 1, 2),
       |bk AS (
       |  SELECT g, h FROM (
       |    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS r
       |    FROM dh)
       |  WHERE r <= $K),
       |flags AS (SELECT DISTINCT g FROM dh),
       |pairsrc AS (
       |  SELECT a.g AS ga, b.g AS gb FROM flags a JOIN flags b ON a.g < b.g),
       |upool AS (
       |  SELECT p.ga, p.gb, d.h
       |  FROM pairsrc p JOIN dh d ON d.g = p.ga OR d.g = p.gb
       |  GROUP BY 1, 2, 3),
       |ubk AS (
       |  SELECT ga, gb, h FROM (
       |    SELECT ga, gb, h,
       |      row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS r
       |    FROM upool)
       |  WHERE r <= $K),
       |usum AS (
       |  SELECT ga, gb, CAST(count(*) AS BIGINT) AS szu,
       |    CASE WHEN count(*) >= $K THEN max(h) END AS hku
       |  FROM ubk GROUP BY 1, 2),
       |both_ AS (
       |  SELECT u.ga, u.gb, CAST(count(*) AS BIGINT) AS n_both
       |  FROM ubk u
       |  JOIN bk x ON x.g = u.ga AND x.h = u.h
       |  JOIN bk y ON y.g = u.gb AND y.h = u.h
       |  GROUP BY 1, 2),
       |cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g FROM dh GROUP BY 1),
       |inter AS (
       |  SELECT a.g AS ga, b.g AS gb, CAST(count(*) AS BIGINT) AS n_int
       |  FROM dh a JOIN dh b ON a.h = b.h AND a.g < b.g
       |  GROUP BY 1, 2),
       |est AS (
       |  SELECT u.ga, u.gb,
       |    CAST(coalesce(i.n_int, 0) AS BIGINT) AS n_int,
       |    ca.n_g + cb.n_g - CAST(coalesce(i.n_int, 0) AS BIGINT) AS n_union,
       |    CAST(coalesce(b.n_both, 0) AS DOUBLE)
       |      / nullif(CAST(u.szu AS DOUBLE), 0e0) AS jacc_raw,
       |    ${estSql("u.szu", "u.hku")} AS est_u
       |  FROM usum u
       |  LEFT JOIN both_ b ON b.ga = u.ga AND b.gb = u.gb
       |  JOIN cnt ca ON ca.g = u.ga
       |  JOIN cnt cb ON cb.g = u.gb
       |  LEFT JOIN inter i ON i.ga = u.ga AND i.gb = u.gb)
       |SELECT ga AS flag_a, gb AS flag_b, n_int AS n_int_exact,
       |  n_union AS n_union_exact,
       |  round(CAST(n_int AS DOUBLE) / nullif(CAST(n_union AS DOUBLE), 0e0), 6) + 0.0 AS jacc_exact,
       |  round(jacc_raw, 6) + 0.0 AS jacc_kmv,
       |  round(jacc_raw * est_u, 4) + 0.0 AS int_kmv,
       |  round(jacc_raw - CAST(n_int AS DOUBLE) / nullif(CAST(n_union AS DOUBLE), 0e0), 6) + 0.0 AS err_jacc
       |FROM est""".stripMargin

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
