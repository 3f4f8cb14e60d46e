package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Interval union / coverage — the interval-algebra member the event
  * deck lacks. q18 sessionizes POINT events by gap; fleets of
  * [start, end] INTERVALS (shipments in transit, sessions with
  * duration, maintenance windows) need the union sweep: merge
  * overlapping intervals per key, then report how much of the
  * timeline the key actually covers and how fragmented it is.
  * Utilization, concurrency-billing, and SLA-gap questions are all
  * this one operator.
  *
  * Algorithm: the classic sweep as ONE window pass — sort intervals
  * by (start, end), carry the running max end over predecessors; a
  * new merged block starts exactly where start > that max (exclusive
  * prior frame); block ids are the running count of starts, and one
  * aggregate per block then per key finishes it. O(n log n), no
  * self-join.
  *
  * Exactness: bounds are exact integer days; every comparison and
  * span/gap sum is integer arithmetic. Nothing rounds.
  *
  * Plan/scale: one scan → per-key window (partition by the key — no
  * global sort) → two keyed aggregates. The window state is O(1). */
object Intervals {

  /** Merge + coverage per key from (k, s, e) integer intervals
    * (e ≥ s; e is INCLUSIVE). One row per key: (k, n_intervals,
    * n_blocks, covered, max_gap) — covered counts inclusive units,
    * max_gap the largest uncovered run strictly inside the key's
    * span (0 when seamless). */
  def coverage(intervals: DataFrame): DataFrame = {
    val w = Window.partitionBy("k").orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val blocks = intervals
      .filter(col("s").isNotNull && col("e").isNotNull && col("e") >= col("s"))
      .withColumn("run_end", max("e").over(w))
      .withColumn("is_new", expr(
        "CAST(run_end IS NULL OR s > run_end + 1 AS INT)"))
      // gap to the previous block, measured at the block opener only
      .withColumn("gap", expr(
        "CASE WHEN is_new = 1 AND run_end IS NOT NULL" +
          " THEN s - run_end - 1 ELSE 0 END"))
      .withColumn("blk", sum("is_new").over(
        Window.partitionBy("k").orderBy(col("s"), col("e"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("k", "blk")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_iv"),
        expr("CAST(min(s) AS BIGINT)").as("bs"),
        expr("CAST(max(e) AS BIGINT)").as("be"),
        expr("CAST(max(gap) AS BIGINT)").as("gap"))
    blocks.groupBy("k")
      .agg(
        expr("CAST(sum(n_iv) AS BIGINT)").as("n_intervals"),
        expr("CAST(count(1) AS BIGINT)").as("n_blocks"),
        expr("CAST(sum(be - bs + 1) AS BIGINT)").as("covered"),
        expr("CAST(max(gap) AS BIGINT)").as("max_gap"))
  }

  /** Active-window length: an order keeps its customer "active" for
    * this many days (inclusive) from the order date. */
  val ActiveDays = 30L

  /** q299: customer activity coverage — every order opens a
    * [[ActiveDays]]-day active window; the union per customer yields
    * total active days (covered), activity EPISODES (n_blocks), and
    * the longest dormancy (max_gap) — the subscription-style activity
    * model the q110 churn deck approximates with a single last-order
    * cutoff. */
  def customerActivityCoverage(spark: SparkSession, dir: String): DataFrame =
    coverage(Tables.orders(spark, dir)
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .selectExpr("o_custkey AS k",
        "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS s",
        s"datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')" +
          s" + ${ActiveDays - 1} AS e"))
      .withColumnRenamed("k", "o_custkey")

  /** DuckDB twin: identical sweep (window max-over-predecessors,
    * block counter, two aggregates). */
  val customerActivityCoverageSql: String =
    s"""WITH iv AS (
      |  SELECT o_custkey AS k,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS s,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      + ${ActiveDays - 1} AS e
      |  FROM orders
      |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
      |walked AS (
      |  SELECT k, s, e,
      |    max(e) OVER (PARTITION BY k ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_end
      |  FROM iv),
      |tagged AS (
      |  SELECT k, s, e,
      |    CAST(run_end IS NULL OR s > run_end + 1 AS INT) AS is_new,
      |    CASE WHEN (run_end IS NULL OR s > run_end + 1) AND run_end IS NOT NULL
      |      THEN s - run_end - 1 ELSE 0 END AS gap
      |  FROM walked),
      |blocks AS (
      |  SELECT k, s, e, gap,
      |    sum(is_new) OVER (PARTITION BY k ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS blk
      |  FROM tagged),
      |bagg AS (
      |  SELECT k, blk, CAST(count(*) AS BIGINT) AS n_iv,
      |    CAST(min(s) AS BIGINT) AS bs, CAST(max(e) AS BIGINT) AS be,
      |    CAST(max(gap) AS BIGINT) AS gap
      |  FROM blocks GROUP BY 1, 2)
      |SELECT k AS o_custkey, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
      |  CAST(count(*) AS BIGINT) AS n_blocks,
      |  CAST(sum(be - bs + 1) AS BIGINT) AS covered,
      |  CAST(max(gap) AS BIGINT) AS max_gap
      |FROM bagg GROUP BY 1""".stripMargin
}
