package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** t-digest quantile sketch (Dunning's arcsine scale function) — the
  * QUANTILE member of the sketch deck (q245 HLL: distincts, q246 CMS:
  * frequencies, q260 DDSketch: relative-error quantiles). Where
  * DDSketch guarantees relative VALUE error on fixed log buckets,
  * the t-digest spends its δ centroids by the scale function
  *
  *   K(q) = δ·(asin(2q−1)/π + 1/2)
  *
  * so cluster mass shrinks like √(q(1−q)) near the tails — tight
  * p99/p999 with ~δ centroids regardless of the value range (DDSketch
  * bucket count grows with the dynamic range; the t-digest's budget is
  * fixed). Built here as the deterministic batch construction:
  * value-level cells are assigned to the centroid floor(K(q_mid)) of
  * their midpoint quantile — the static-merge digest, reproducible by
  * construction (no insertion-order dependence to hide).
  *
  * The registered audit reports, per probe quantile, the digest
  * estimate beside the EXACT quantile and the error — the q234/q241
  * honest-audit doctrine: the sketch ships with its measured error.
  *
  * Exactness: cell counts/cumulatives are exact BIGINTs; q_mid is one
  * rational; K is 1e-9-snapped before floor (asin differs in the last
  * ulp across libms — the lnSnap discipline); centroid means are
  * exact-integer ratios (Σv·cnt as DECIMAL(38,0)); ranks, the
  * bracketing interpolation, and err_ppm ride ONE shared-text double
  * chain. The exact side picks min{v : cum ≥ ceil(q·N)} — an integer
  * comparison.
  *
  * Plan/scale: one corpus scan → value-level cells; every window runs
  * over the CELL frame (value-range-bounded, the q48/q181 class) or
  * the ≤ δ centroid frame. Probes and centroids broadcast. At 100 TB
  * the only growing term is distinct-value cardinality — the same
  * boundary every sketch in the deck documents. */
object TDigest {

  /** Compression: centroid budget. */
  val Delta = 100

  /** Probe quantiles in ppm. */
  val ProbesPpm: Seq[Long] = Seq(500000L, 900000L, 990000L, 999000L)

  /** Snapped scale function of the midpoint quantile (qm in (0,1)). */
  private val KSql =
    s"CAST(floor(($Delta * (asin(2.0 * qm - 1.0) / pi() + 0.5)) * 1e9 + 5e-1)" +
      " AS DOUBLE) / 1e9"

  /** q287-style digest audit from a value frame with a single BIGINT
    * column v. Returns one row per probe: (q_ppm, n_centroids, est,
    * exact_v, err_ppm). `unit` scales est display (cents→dollars);
    * exact_v stays in raw grid units. */
  def digestAudit(vals: DataFrame, unit: Double = 1.0): DataFrame = {
    val spark = vals.sparkSession
    val cells = vals.filter(col("v").isNotNull)
      .groupBy("v").agg(expr("CAST(count(1) AS BIGINT)").as("cnt"))
      .localCheckpoint(true) // digest build + exact side
    val tot = cells.agg(expr("CAST(sum(cnt) AS BIGINT)").as("n"))
    val wBelow = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val assigned = cells
      .withColumn("c", coalesce(sum("cnt").over(wBelow), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("qm", expr(
        "(CAST(c AS DOUBLE) + CAST(cnt AS DOUBLE) / 2.0) / CAST(n AS DOUBLE)"))
      .withColumn("cid", expr(s"CAST(floor($KSql) AS BIGINT)"))
      .localCheckpoint(true) // centroid build + exact side share it
    val cent = assigned
      .groupBy("cid")
      .agg(
        expr("CAST(sum(cnt) AS BIGINT)").as("w"),
        expr("CAST(sum(CAST(v AS DECIMAL(38,0)) * cnt) AS DECIMAL(38,0))")
          .as("sv"))
      .selectExpr("cid", "w", "CAST(sv AS DOUBLE) / CAST(w AS DOUBLE) AS m")
    val wCentBelow = Window.orderBy("cid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCent = Window.orderBy("cid")
    val ranked = cent
      .withColumn("wb", coalesce(sum("w").over(wCentBelow), lit(0L)))
      .withColumn("rank", expr("CAST(wb AS DOUBLE) + CAST(w AS DOUBLE) / 2.0"))
      .withColumn("lead_rank", lead("rank", 1).over(wCent))
      .withColumn("lead_m", lead("m", 1).over(wCent))
      .localCheckpoint(true) // probe bracket + first/size reads
    val nCent = ranked.agg(
      expr("CAST(count(1) AS BIGINT)").as("n_centroids"),
      expr("min_by(m, cid)").as("first_m"))
    val probes = spark.range(0, 1)
      .select(explode(expr(
        s"array(${ProbesPpm.mkString("L,")}L)")).as("q_ppm"))
      .crossJoin(broadcast(tot))
      .withColumn("target", expr(
        "CAST(q_ppm AS DOUBLE) / 1e6 * CAST(n AS DOUBLE)"))
      .localCheckpoint(true)
    val bracket = probes
      .join(broadcast(ranked), expr("rank <= target"))
      .groupBy("q_ppm", "target")
      .agg(max("rank").as("r1"))
      .join(broadcast(ranked), expr("rank = r1"))
      .selectExpr("q_ppm",
        "CASE WHEN lead_rank IS NULL OR target <= rank THEN m" +
          " ELSE m + (target - rank) * (lead_m - m) / (lead_rank - rank)" +
          " END AS est_raw")
    val est = probes.select("q_ppm")
      .join(bracket, Seq("q_ppm"), "left")
      .crossJoin(broadcast(nCent))
      .selectExpr("q_ppm", "n_centroids",
        "coalesce(est_raw, first_m) AS est_raw")
    val exact = probes
      .join(assigned.select("v", "cnt", "c"),
        expr("c + cnt >= CAST(ceil(target) AS BIGINT)"))
      .groupBy("q_ppm")
      .agg(min("v").as("exact_v"))
    est.join(exact, "q_ppm")
      .selectExpr("q_ppm", "n_centroids",
        s"round(est_raw / $unit, 4) + 0.0 AS est",
        "exact_v",
        "CAST(floor(abs(est_raw - CAST(exact_v AS DOUBLE))" +
          " / nullif(CAST(exact_v AS DOUBLE), 0.0) * 1e6) AS BIGINT)" +
          " AS err_ppm")
  }

  /** q287: δ=100 digest over order prices (cents) with the
    * tail-probe audit — the fixed-budget alternative DDSketch (q260)
    * trades against, measured on the same corpus. */
  def orderPriceDigest(spark: SparkSession, dir: String): DataFrame =
    digestAudit(Tables.orders(spark, dir)
      .filter(col("o_totalprice").isNotNull)
      .selectExpr("CAST(floor(o_totalprice * 1e2) AS BIGINT) AS v"),
      unit = 100.0)

  /** DuckDB twin: identical cells, snapped scale assignment, centroid
    * interpolation, exact side. */
  val orderPriceDigestSql: String =
    s"""WITH cells AS (
       |  SELECT CAST(floor(o_totalprice * 1e2) AS BIGINT) AS v,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cells),
       |assigned AS (
       |  SELECT v, cnt, c, n,
       |    CAST(floor($KSql) AS BIGINT) AS cid
       |  FROM (
       |    SELECT v, cnt, c, n,
       |      (CAST(c AS DOUBLE) + CAST(cnt AS DOUBLE) / 2.0)
       |        / CAST(n AS DOUBLE) AS qm
       |    FROM (
       |      SELECT v, cnt,
       |        coalesce(CAST(sum(cnt) OVER (ORDER BY v
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |          AS BIGINT), 0) AS c
       |      FROM cells) CROSS JOIN tot)),
       |cent AS (
       |  SELECT cid, CAST(sum(cnt) AS BIGINT) AS w,
       |    CAST(CAST(sum(CAST(v AS HUGEINT) * cnt) AS HUGEINT) AS DOUBLE)
       |      / CAST(sum(cnt) AS DOUBLE) AS m
       |  FROM assigned GROUP BY 1),
       |ranked AS (
       |  SELECT cid, w, m,
       |    CAST(coalesce(sum(w) OVER (ORDER BY cid
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
       |      + CAST(w AS DOUBLE) / 2.0 AS rank,
       |    lead(m, 1) OVER (ORDER BY cid) AS lead_m
       |  FROM cent),
       |ranked2 AS (
       |  SELECT *, lead(rank, 1) OVER (ORDER BY cid) AS lead_rank
       |  FROM ranked),
       |ncent AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_centroids,
       |    min_by(m, cid) AS first_m
       |  FROM ranked2),
       |probes AS (
       |  SELECT q_ppm, CAST(q_ppm AS DOUBLE) / 1e6 * CAST(n AS DOUBLE)
       |    AS target
       |  FROM (SELECT unnest([${ProbesPpm.mkString(", ")}]) AS q_ppm)
       |  CROSS JOIN tot),
       |bracket AS (
       |  SELECT q_ppm,
       |    CASE WHEN lead_rank IS NULL OR target <= rank THEN m
       |      ELSE m + (target - rank) * (lead_m - m) / (lead_rank - rank)
       |      END AS est_raw
       |  FROM (
       |    SELECT p.q_ppm, p.target, max(rank) AS r1
       |    FROM probes p JOIN ranked2 ON rank <= target
       |    GROUP BY 1, 2) b
       |  JOIN ranked2 ON rank = r1),
       |est AS (
       |  SELECT q_ppm, n_centroids, coalesce(est_raw, first_m) AS est_raw
       |  FROM (SELECT q_ppm FROM probes) p
       |  LEFT JOIN bracket USING (q_ppm) CROSS JOIN ncent),
       |exact AS (
       |  SELECT q_ppm, min(v) AS exact_v
       |  FROM probes JOIN assigned
       |    ON c + cnt >= CAST(ceil(target) AS BIGINT)
       |  GROUP BY 1)
       |SELECT q_ppm, n_centroids,
       |  round(est_raw / 100.0, 4) + 0.0 AS est,
       |  exact_v,
       |  CAST(floor(abs(est_raw - CAST(exact_v AS DOUBLE))
       |    / nullif(CAST(exact_v AS DOUBLE), 0.0) * 1e6) AS BIGINT)
       |    AS err_ppm
       |FROM est JOIN exact USING (q_ppm)""".stripMargin
}
