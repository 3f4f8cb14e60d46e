package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.Tables

/** As-of (time-travel) join — an operator Spark's join menu lacks
  * natively. For every left row, attach the single right row with the
  * greatest `rightTs` ≤ the left row's `leftTs` within the same key
  * (the "latest state at-or-before this event" lookup the reference's
  * dashboard does implicitly by joining the newest snapshot).
  *
  * Shape: NOT a join at all — a union + one running-`last` window.
  * Left and right rows interleave in (key, ts) order with right rows
  * sorting first on ties (so an equal-timestamp state is visible, i.e.
  * inclusive ≤); a running `last(…, ignoreNulls)` carries the newest
  * right payload forward; left rows then project it. ONE shuffle on the
  * key, O(1) running state per partition — the canonical distributed
  * as-of, with none of the per-row subquery or range-join blowup a
  * naive formulation costs. Same key-skew exposure as any
  * per-key window (q18 sessionize); inherent to the semantics.
  *
  * The right payload travels inside a STRUCT marker, so a legitimately
  * NULL right column doesn't get skipped over by ignoreNulls (the
  * struct itself is non-null for every right row).
  *
  * Requirement: right rows unique per (keys, rightTs) — dedupe first
  * (e.g. `max_by` the payload on a sequence column), otherwise which
  * same-timestamp row wins is tie-ordering-dependent.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    val lPayload = left.columns.toSeq.filterNot(keys.contains)
    val rPayload = right.columns.toSeq.filterNot(keys.contains)
    require(lPayload.intersect(rPayload).isEmpty,
      s"left/right column collision: ${lPayload.intersect(rPayload).mkString(", ")}")
    require(lPayload.contains(leftTs) && rPayload.contains(rightTs),
      "ts columns must be non-key columns of their sides")
    val rStructType = StructType(right.schema.fields.filter(f => rPayload.contains(f.name)))
    // NULL join keys: Window.partitionBy groups nulls TOGETHER, which
    // would hand null-key left rows the null-key state — but a SQL
    // equality predicate (the DuckDB ASOF twin's l.key = r.key) never
    // matches NULL. Dropping null-key RIGHT rows restores left-join
    // semantics exactly: null-key left rows survive with a null right
    // payload, and no state ever attaches across a null key.
    val rightNonNull = keys.foldLeft(right)((d, k) => d.filter(col(k).isNotNull))
    val lTagged = left.select(
      keys.map(col) ++ lPayload.map(col) ++ Seq(
        col(leftTs).as("__t"), lit(1).as("__side"),
        lit(null).cast(rStructType).as("__r")): _*)
    val rTagged = rightNonNull.select(
      keys.map(col) ++ lPayload.map(c =>
        lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        col(rightTs).as("__t"), lit(0).as("__side"),
        struct(rPayload.map(col): _*).as("__r")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__rlast", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(keys.map(col) ++ lPayload.map(col) ++
        rPayload.map(p => col("__rlast").getField(p).as(p)): _*)
  }

  // ---- q35: event measures as-of joined to the latest user state ----

  /** Measures (click/view/purchase) pick up the user's most recent
    * state change (signup/error) at-or-before their timestamp. State
    * rows are deduped per (user, ts) by `max_by` on event_id — the
    * uniqueness [[asofJoin]] requires and DuckDB's ASOF needs for a
    * deterministic oracle. */
  def asofEventState(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val left = ev
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        (round(col("value"), 4) + 0.0).as("value"))
    val right = ev
      .filter(col("event_type").isin("signup", "error"))
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("sv"))
      .select(col("user_id"), col("ts").as("state_ts"),
        (round(col("sv"), 4) + 0.0).as("state_value"))
    asofJoin(left, right, Seq("user_id"), "ts", "state_ts")
  }

  /** DuckDB twin via native ASOF LEFT JOIN — an INDEPENDENT
    * formulation (DuckDB's own sort-merge as-of) that must agree with
    * the union+window plan row-for-row. */
  val asofEventStateSql: String =
    """WITH l AS (
      |  SELECT event_id, user_id, ts, event_type, round(value, 4) + 0.0 AS value
      |  FROM events WHERE event_type IN ('click', 'view', 'purchase')),
      |r AS (
      |  SELECT user_id, ts AS state_ts, round(max_by(value, event_id), 4) + 0.0 AS state_value
      |  FROM events WHERE event_type IN ('signup', 'error')
      |  GROUP BY user_id, ts)
      |SELECT l.event_id, l.user_id, l.ts, l.event_type, l.value,
      |  r.state_ts, r.state_value
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.ts >= r.state_ts""".stripMargin
}
