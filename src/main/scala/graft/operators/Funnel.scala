package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Window funnel — multi-step conversion analytics: how far does each
  * user progress through an ordered step sequence (view → click →
  * purchase here) within a time window of the first step? The
  * ClickHouse `windowFunnel` shape, re-expressed Spark-first as ONE
  * per-user pass: collect the user's events, sort in event-time order,
  * and run the stage machine as a codegen'd `aggregate` fold over the
  * array — one shuffle, no self-joins, no per-stage passes.
  *
  * Semantics (first-anchor, strictly-increasing): the FIRST step-1
  * event anchors the funnel at t₁; each later stage needs an event
  * strictly after the previous accepted one and within
  * t₁ + [[WindowDays]]. Equivalently (and how the oracle computes it):
  * t₁ = min step-1 time, t₂ = min step-2 time in (t₁, t₁+W], t₃ = min
  * step-3 time in (t₂, t₁+W] — the fold picks the first qualifying
  * event in sorted order, which is exactly that conditional minimum,
  * so the two formulations agree on every discrete value (no floats
  * anywhere). Null-time events cannot anchor or advance a funnel
  * (mirroring the oracle's null-skipping `min`), and a null user key
  * is one group on both sides (the oracle joins null-safely).
  *
  * Scale shape: one `collect_list` aggregate keyed by user — per-user
  * state is the user's own event history (the same bound ClickHouse
  * accepts; cap with a `slice` after `sort_array` if a pathological
  * user must be bounded) — then a projection-level fold. The oracle's
  * join cascade would be 3 extra shuffles in Spark; the fold needs
  * none.
  */
object Funnel {

  val WindowDays = 7
  val Steps = Seq("view", "click", "purchase")

  /** q76: (user_id, stage ∈ 0..3, anchor_ts) — stage reached within
    * the window; anchor is the first step-1 event (null at stage 0). */
  def windowFunnel(spark: SparkSession, dir: String): DataFrame =
    windowFunnelOn(Tables.events(spark, dir))

  /** The fold over any (user_id, event_id, event_type, ts) frame. */
  def windowFunnelOn(events: DataFrame): DataFrame = {
    val caseArms = Steps.zipWithIndex.map { case (step, i) =>
      if (i == 0)
        // ts IS NOT NULL: a null-time step-1 event must not anchor the
        // funnel at a NULL t0 (which would stall every later arm's
        // comparison) — the oracle's min(ts) skips nulls, and the later
        // arms already null-propagate to ELSE acc
        s"WHEN acc.stage = 0 AND e.event_type = '$step' AND e.ts IS NOT NULL " +
          s"THEN named_struct('stage', 1, 't0', e.ts, 'tp', e.ts)"
      else
        s"WHEN acc.stage = $i AND e.event_type = '$step' AND e.ts > acc.tp " +
          s"AND e.ts <= acc.t0 + INTERVAL $WindowDays DAYS " +
          s"THEN named_struct('stage', ${i + 1}, 't0', acc.t0, 'tp', e.ts)"
    }.mkString(" ")
    events
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .withColumn("f", expr(
        s"""aggregate(evs,
           |  named_struct('stage', 0, 't0', CAST(NULL AS TIMESTAMP),
           |               'tp', CAST(NULL AS TIMESTAMP)),
           |  (acc, e) -> CASE $caseArms ELSE acc END)""".stripMargin))
      .select(col("user_id"),
        col("f.stage").as("stage"), col("f.t0").as("anchor_ts"))
  }

  /** DuckDB twin: the conditional-minimum cascade (provably the same
    * discrete values as the fold — see scaladoc). */
  val windowFunnelSql: String =
    s"""WITH t1 AS (
       |  SELECT user_id, min(ts) AS t1 FROM events
       |  WHERE event_type = '${Steps(0)}' GROUP BY 1),
       |t2 AS (
       |  SELECT e.user_id, min(e.ts) AS t2
       |  FROM events e JOIN t1 USING (user_id)
       |  WHERE e.event_type = '${Steps(1)}' AND e.ts > t1.t1
       |    AND e.ts <= t1.t1 + INTERVAL $WindowDays DAY
       |  GROUP BY 1),
       |t3 AS (
       |  SELECT e.user_id, min(e.ts) AS t3
       |  FROM events e JOIN t1 USING (user_id) JOIN t2 USING (user_id)
       |  WHERE e.event_type = '${Steps(2)}' AND e.ts > t2.t2
       |    AND e.ts <= t1.t1 + INTERVAL $WindowDays DAY
       |  GROUP BY 1)
       |SELECT u.user_id,
       |  CASE WHEN t3.t3 IS NOT NULL THEN 3
       |       WHEN t2.t2 IS NOT NULL THEN 2
       |       WHEN t1.t1 IS NOT NULL THEN 1
       |       ELSE 0 END AS stage,
       |  t1.t1 AS anchor_ts
       |FROM (SELECT DISTINCT user_id FROM events) u
       |LEFT JOIN t1 ON u.user_id IS NOT DISTINCT FROM t1.user_id
       |LEFT JOIN t2 ON u.user_id IS NOT DISTINCT FROM t2.user_id
       |LEFT JOIN t3 ON u.user_id IS NOT DISTINCT FROM t3.user_id""".stripMargin
}
