package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Pareto / ABC classification — rank items by revenue descending,
  * compute each item's cumulative revenue share, and band them into
  * the classic inventory classes: A (the head that makes up the
  * first `aPct`% of revenue), B (to `bPct`%), C (the tail). The
  * "which 20% of the catalog carries 80% of the business" table.
  *
  * Scale design — a DISTRIBUTED PREFIX SUM, not a global window:
  * items band by `rev div bandWidth`; band totals/counts cumsum over
  * the (value-range-bounded) band dimension; each item then needs
  * only a window PARTITIONED BY ITS BAND plus the broadcast
  * strictly-higher-band offset. The global sort order
  * (rev DESC, key) is exactly (band DESC, rev DESC, key) because the
  * band is monotone in rev — so the decomposition reproduces the
  * single-window prefix sum integer-for-integer while every
  * item-level window stays band-local and parallel. `bandWidth` is
  * the parallelism knob: pick it so max(rev)/bandWidth lands in the
  * thousands at your scale.
  *
  * Exactness: revenue is exact integer cent-percent units
  * (cents × (100 − discount points)); cumulative sums and the class
  * boundaries are pure integer arithmetic (100·cum ≤ pct·total
  * cross-multiplication — no rounded share ever decides a class);
  * the displayed share/revenue are ONE shared-text conversion each. */
object Pareto {

  /** ABC table over items (keyCol, revCol exact nonneg integer
    * units). Returns (key, revenue-units, rank, cum_share_pct,
    * abc). */
  def abc(items: DataFrame, keyCol: String, revCol: String,
      bandWidth: Long, aPct: Int = 80, bPct: Int = 95): DataFrame = {
    require(bandWidth > 0 && aPct > 0 && bPct > aPct && bPct <= 100)
    // item-dimension frame reused by band offsets, the grand total,
    // and the final banded window: checkpoint so the upstream item
    // aggregation runs once (no CSE across repeated frames)
    val it = items
      .select(col(keyCol).as("k"),
        col(revCol).cast("decimal(38,0)").as("rev_c"))
      .withColumn("band", expr(s"CAST(rev_c div ${bandWidth}L AS BIGINT)"))
      .localCheckpoint(true)
    val wBand = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = it.groupBy("band")
      .agg(expr("CAST(sum(rev_c) AS DECIMAL(38,0))").as("btot"),
        expr("CAST(count(1) AS BIGINT)").as("bcnt"))
      .withColumn("cum_tot", sum("btot").over(wBand))
      .withColumn("cum_cnt", sum("bcnt").over(wBand))
      .selectExpr("band",
        "CAST(cum_tot - btot AS DECIMAL(38,0)) AS off_tot",
        "CAST(cum_cnt - bcnt AS BIGINT) AS off_cnt")
    val tot = it.agg(expr("CAST(sum(rev_c) AS DECIMAL(38,0))").as("total"))
    val wIn = Window.partitionBy("band")
      .orderBy(col("rev_c").desc, col("k"))
    it.join(broadcast(offsets), "band").crossJoin(broadcast(tot))
      .withColumn("in_tot", sum(col("rev_c"))
        .over(wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("in_rnk", row_number().over(wIn))
      .selectExpr("k", "rev_c",
        "CAST(off_cnt + in_rnk AS BIGINT) AS rnk",
        "CAST(off_tot + in_tot AS DECIMAL(38,0)) AS cum_c", "total")
      .selectExpr("k", "rev_c", "rnk",
        "round(CAST(cum_c AS DOUBLE) / CAST(total AS DOUBLE) * 1e2, 4)" +
          " + 0.0 AS cum_share_pct",
        s"CASE WHEN 100 * cum_c <= $aPct * total THEN 'A'" +
          s" WHEN 100 * cum_c <= $bPct * total THEN 'B'" +
          " ELSE 'C' END AS abc")
  }

  /** Parallelism knob for the registered query: ~$10k of discounted
    * revenue per band in cent-percent units. */
  val BandWidth = 100000000L

  /** q117: ABC-classify parts by lifetime discounted revenue.
    * Revenue is exact cent-percent units:
    * cents(extendedprice) × (100 − discount points). */
  def partAbc(spark: SparkSession, dir: String): DataFrame =
    abc(
      Tables.lineitem(spark, dir)
        .filter(col("l_partkey").isNotNull && col("l_extendedprice").isNotNull
          && col("l_discount").isNotNull)
        .groupBy(col("l_partkey"))
        .agg(expr("CAST(sum(CAST(floor(l_extendedprice * 1e2) AS BIGINT)" +
          " * (100 - CAST(floor(l_discount * 1e2) AS BIGINT)))" +
          " AS DECIMAL(38,0))").as("rev_c")),
      "l_partkey", "rev_c", BandWidth)
      .selectExpr("k AS l_partkey",
        // round at the unit's NATIVE scale (4: cent-percent units) so
        // the round is tie-free — a 2dp round hits .xx5 ties that the
        // two engines break differently
        "round(CAST(rev_c AS DOUBLE) / 1e4, 4) + 0.0 AS revenue",
        "rnk", "cum_share_pct", "abc")

  val partAbcSql: String =
    """WITH items AS (
      |  SELECT l_partkey AS k,
      |    CAST(sum(CAST(floor(l_extendedprice * 1e2) AS BIGINT)
      |      * (100 - CAST(floor(l_discount * 1e2) AS BIGINT))) AS HUGEINT) AS rev_c
      |  FROM lineitem
      |  WHERE l_partkey IS NOT NULL AND l_extendedprice IS NOT NULL
      |    AND l_discount IS NOT NULL
      |  GROUP BY 1),
      |tot AS (SELECT CAST(sum(rev_c) AS HUGEINT) AS total FROM items),
      |ranked AS (
      |  SELECT k, rev_c,
      |    sum(rev_c) OVER (ORDER BY rev_c DESC, k
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
      |    row_number() OVER (ORDER BY rev_c DESC, k) AS rnk
      |  FROM items)
      |SELECT k AS l_partkey,
      |  round(CAST(rev_c AS DOUBLE) / 1e4, 4) + 0.0 AS revenue,
      |  CAST(rnk AS BIGINT) AS rnk,
      |  round(CAST(cum_c AS DOUBLE) / CAST(total AS DOUBLE) * 1e2, 4)
      |    + 0.0 AS cum_share_pct,
      |  CASE WHEN 100 * cum_c <= 80 * total THEN 'A'
      |    WHEN 100 * cum_c <= 95 * total THEN 'B'
      |    ELSE 'C' END AS abc
      |FROM ranked CROSS JOIN tot""".stripMargin
}
