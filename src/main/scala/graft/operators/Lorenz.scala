package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Lorenz curve points per group — the WHOLE inequality curve whose
  * area q108's Gini collapses to one scalar: for each population
  * decile (members ordered by value ascending), the cumulative share
  * of total value held. "The bottom 50% of customers hold 9% of the
  * balances" is L(5) = 0.09.
  *
  * Convention (member-granular, EXACT): decile d reads after
  * m = ⌈d·n/10⌉ members; the qualifying value cell is the first with
  * cum_cnt ≥ m, and because every member inside a cell holds the SAME
  * value, the within-cell interpolation is exact integer arithmetic:
  * L·tv = prev_sv + (m − prev_cnt)·v. Perfect equality yields the
  * exact diagonal (L(d) = d/10) even though ties share one cell.
  * Decile 10 is exactly 1. Nonpositive values are excluded (the q108
  * rule — Lorenz is undefined under negatives).
  *
  * Plan/scale: observations collapse to (group, value) cells first
  * (value-range-bounded, checkpointed), a BANDED cumulative pair over
  * the cells (BandedCumsum — per-task cap even at range saturation),
  * broadcast group totals (carrying the CellGuard), a 10-row literal
  * decile frame, and a min(struct) first-qualifying-cell election
  * (no per-(group, decile) window). */
object Lorenz {

  /** Per-group decile Lorenz points over exact integer `valCol`.
    * Returns (group, decile, n_members, pop_share, value_share).
    * CellGuard-ed: a continuous value column (cells ≈ rows) fails
    * loudly instead of building a corpus-cardinality window. */
  def lorenzDeciles(obs: DataFrame, groupCol: String, valCol: String,
      maxCells: Long = CellGuard.DefaultMaxCells): DataFrame = {
    // r10: the per-group cumulative pair is a BandedCumsum and the
    // first-qualifying-cell election a min(struct) aggregate — the
    // previous per-group and per-(group, decile) windows put a whole
    // group's cell frame in one task (range-bounded, but serial once
    // the range saturates)
    val cells = obs
      .selectExpr(s"$groupCol AS g", s"$valCol AS v")
      .filter("v > 0")
      .groupBy("g", "v")
      .agg(expr("CAST(count(1) AS BIGINT)").as("cnt"),
        expr("CAST(sum(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0))")
          .as("sv"))
      .localCheckpoint(true) // totals + the banded cumulative share it
    val tot = cells.groupBy("g")
      .agg(expr("CAST(sum(cnt) AS BIGINT)").as("n"),
        expr("CAST(sum(sv) AS DECIMAL(38,0))").as("tv"),
        expr("CAST(count(1) AS BIGINT)").as("n_cells"))
      .filter(expr(CellGuard.sqlGuard("lorenzDeciles", "n_cells", maxCells)))
    BandedCumsum
      .cumsum(cells, Seq("g"), "v", Seq("cnt", "sv"), inputCheckpointed = true)
      .join(broadcast(tot), "g")
      .select(col("g"), col("v"), col("cnt"), col("sv"),
        col("cum_cnt"), col("cum_sv"), col("n"), col("tv"),
        explode(expr("sequence(1, 10)")).as("dec"))
      .withColumn("m", expr("(dec * n + 9) div 10"))
      .filter("cum_cnt >= m")
      // first qualifying cell = min cum_cnt among qualifiers (cum_cnt
      // is strictly increasing over a group's cells, so the struct min
      // is the q117-style deterministic election — no (g, dec) window)
      .groupBy("g", "dec")
      .agg(min(struct(col("cum_cnt"), col("v"), col("cnt"), col("sv"),
        col("cum_sv"), col("n"), col("tv"), col("m"))).as("s"))
      .selectExpr("g", "CAST(dec AS INT) AS decile", "s.n AS n_members",
        "round(CAST(s.m AS DOUBLE) / CAST(s.n AS DOUBLE), 6)" +
          " + 0.0 AS pop_share",
        "round(CAST(s.cum_sv - s.sv + (s.m - (s.cum_cnt - s.cnt)) * s.v" +
          " AS DOUBLE) / CAST(s.tv AS DOUBLE), 6) + 0.0 AS value_share")
  }

  /** q123: account-balance concentration curve per market segment —
    * the curve behind q108's scalar. */
  def segmentLorenz(spark: SparkSession, dir: String): DataFrame =
    lorenzDeciles(
      Tables.customer(spark, dir)
        .filter(col("c_acctbal").isNotNull && col("c_mktsegment").isNotNull)
        .selectExpr("c_mktsegment",
          "CAST(floor(c_acctbal * 1e2) AS BIGINT) AS bal_c"),
      "c_mktsegment", "bal_c")
      .withColumnRenamed("g", "c_mktsegment")

  val segmentLorenzSql: String =
    """WITH obs AS (
      |  SELECT c_mktsegment AS g, CAST(floor(c_acctbal * 1e2) AS BIGINT) AS v
      |  FROM customer
      |  WHERE c_acctbal IS NOT NULL AND c_mktsegment IS NOT NULL),
      |cells AS (
      |  SELECT g, v, CAST(count(*) AS BIGINT) AS cnt,
      |    CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS sv
      |  FROM obs WHERE v > 0 GROUP BY 1, 2),
      |tot AS (
      |  SELECT g, CAST(sum(cnt) AS BIGINT) AS n,
      |    CAST(sum(sv) AS DECIMAL(38,0)) AS tv
      |  FROM cells GROUP BY 1),
      |cum AS (
      |  SELECT g, v, cnt, sv,
      |    sum(cnt) OVER (PARTITION BY g ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cnt,
      |    sum(sv) OVER (PARTITION BY g ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_sv
      |  FROM cells),
      |cand AS (
      |  SELECT g, dec, v, cnt, sv, cum_cnt, cum_sv, n, tv,
      |    (dec * n + 9) // 10 AS m,
      |    row_number() OVER (PARTITION BY g, dec ORDER BY cum_cnt) AS rn
      |  FROM cum JOIN tot USING (g)
      |  CROSS JOIN (SELECT unnest(range(1, 11)) AS dec)
      |  WHERE cum_cnt >= (dec * n + 9) // 10)
      |SELECT g AS c_mktsegment, CAST(dec AS INT) AS decile, n AS n_members,
      |  round(CAST(m AS DOUBLE) / CAST(n AS DOUBLE), 6)
      |    + 0.0 AS pop_share,
      |  round(CAST(cum_sv - sv + (m - (cum_cnt - cnt)) * v AS DOUBLE)
      |    / CAST(tv AS DOUBLE), 6) + 0.0 AS value_share
      |FROM cand WHERE rn = 1""".stripMargin
}
