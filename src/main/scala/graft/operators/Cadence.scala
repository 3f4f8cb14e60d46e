package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Purchase cadence — per-entity inter-event gap statistics and an
  * overdue triage: how often does each customer order, and who has
  * gone quiet relative to their OWN rhythm? The churn-risk
  * deliverable q51's cohort retention can't give, because retention
  * is cohort-aggregate while "overdue" needs each customer's personal
  * gap distribution.
  *
  * Semantics: gaps are day differences between consecutive orders
  * (same-day repeat orders contribute gap 0 — the tie order doesn't
  * change the gap multiset, so results are deterministic); the median
  * is the exact LOWER median (element (n+1) div 2 of the ascending
  * gap list — no interpolated half-days); `status` is 'new' (no gaps
  * to judge by), 'overdue' (days since last order > 2× personal
  * median gap), else 'active'.
  *
  * Exactness: everything integer days until the one shared-text mean
  * division; the overdue comparison is pure integer arithmetic.
  *
  * Plan/scale: one per-customer window (activity-bounded partitions),
  * one keyed aggregate; the gap list is collect_list over a
  * customer's own orders — activity-bounded, the same precondition
  * as q51/q76. The dataset max date is a 1-row broadcast. */
object Cadence {

  /** Per-key cadence over an event frame (keyCol, dayCol integer
    * day). */
  def cadence(events: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val ev = events.select(col(keyCol).as("k"), col(dayCol).as("d"))
    val w = Window.partitionBy("k").orderBy("d")
    // the dataset max date is max(last_d) over the per-key frame —
    // derived from the checkpointed aggregate, NOT a second scan of
    // the raw events (no CSE across repeated frames)
    val per = ev.withColumn("gap", expr("d - lag(d, 1) OVER" +
        " (PARTITION BY k ORDER BY d)"))
      .groupBy("k")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_orders"),
        expr("CAST(count(gap) AS BIGINT)").as("n_gaps"),
        expr("CAST(sum(gap) AS BIGINT)").as("sg"),
        expr("CAST(max(gap) AS BIGINT)").as("max_gap_d"),
        max("d").as("last_d"),
        expr("sort_array(collect_list(gap))").as("gl"))
      .localCheckpoint(true)
    val mx = per.agg(max("last_d").as("mx"))
    per
      .crossJoin(broadcast(mx))
      .withColumn("median_gap_d",
        expr("CASE WHEN n_gaps > 0 THEN CAST(element_at(gl," +
          " CAST((n_gaps + 1) div 2 AS INT)) AS BIGINT) END"))
      .selectExpr("k", "n_orders", "n_gaps",
        "round(CAST(sg AS DOUBLE) / nullif(CAST(n_gaps AS DOUBLE), 0e0)," +
          " 4) + 0.0 AS mean_gap_d",
        "median_gap_d", "max_gap_d",
        "CAST(mx - last_d AS BIGINT) AS days_since_last",
        "CASE WHEN n_gaps = 0 THEN 'new'" +
          " WHEN mx - last_d > 2 * median_gap_d THEN 'overdue'" +
          " ELSE 'active' END AS status")
  }

  /** q118: order cadence + overdue triage per customer. */
  def customerCadence(spark: SparkSession, dir: String): DataFrame =
    cadence(
      Tables.orders(spark, dir)
        .filter(col("o_orderdate").isNotNull)
        .selectExpr("o_custkey",
          "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS d"),
      "o_custkey", "d")
      .withColumnRenamed("k", "o_custkey")

  val customerCadenceSql: String =
    """WITH ev AS (
      |  SELECT o_custkey AS k,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d
      |  FROM orders WHERE o_orderdate IS NOT NULL),
      |g AS (
      |  SELECT k, d, d - lag(d, 1) OVER (PARTITION BY k ORDER BY d) AS gap
      |  FROM ev),
      |mx AS (SELECT max(d) AS mx FROM ev),
      |per AS (
      |  SELECT k,
      |    CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(count(gap) AS BIGINT) AS n_gaps,
      |    CAST(sum(gap) AS BIGINT) AS sg,
      |    CAST(max(gap) AS BIGINT) AS max_gap_d,
      |    max(d) AS last_d,
      |    list_sort(list(gap) FILTER (WHERE gap IS NOT NULL)) AS gl
      |  FROM g GROUP BY 1),
      |med AS (
      |  SELECT *, CASE WHEN n_gaps > 0 THEN
      |      CAST(gl[CAST((n_gaps + 1) // 2 AS INT)] AS BIGINT) END AS median_gap_d
      |  FROM per CROSS JOIN mx)
      |SELECT k AS o_custkey, n_orders, n_gaps,
      |  round(CAST(sg AS DOUBLE) / nullif(CAST(n_gaps AS DOUBLE), 0e0),
      |    4) + 0.0 AS mean_gap_d,
      |  median_gap_d, max_gap_d,
      |  CAST(mx - last_d AS BIGINT) AS days_since_last,
      |  CASE WHEN n_gaps = 0 THEN 'new'
      |    WHEN mx - last_d > 2 * median_gap_d THEN 'overdue'
      |    ELSE 'active' END AS status
      |FROM med""".stripMargin
}
