package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Slowly-changing-dimension type-2 history — the load pattern the
  * reference approximates with full-replace / delete-and-append sinks
  * (`school_outcomes_etl.py` `if_exists='replace'`,
  * `election_results_etl.py` delete-by-county): instead of overwriting
  * state, keep every version as an effective-dated row
  * (`valid_from`, `valid_to`, `is_current`). Kimball SCD Type 2,
  * re-expressed as a change-stream compression:
  *
  *   1. order each key's observations, drop rows whose tracked state
  *      equals the previous observation (change-point detection via
  *      `lag`);
  *   2. each surviving change opens a version valid until the NEXT
  *      change (`lead`), the last one open-ended (`valid_to` null,
  *      `is_current` true).
  *
  * The snapshot+updates merge form reduces to this: union the tagged
  * snapshot with the update batch and compress. Scale shape: ONE
  * shuffle by key; both windows sort on the identical
  * (key, ts, tiebreak) order so Spark plans a single sort, and state
  * per key is O(versions), never O(observations), after step 1's
  * filter. No joins.
  */
object Scd {

  /** Compress an observation stream into SCD-2 validity intervals.
    *
    * @param changes  observation rows
    * @param keyCol   business key column
    * @param stateCol tracked state column (compare-on-change)
    * @param tsCol    observation time column
    * @param tieCol   unique tiebreaker within (key, ts) so ordering —
    *                 and therefore version assignment — is total
    * @return (key, state, valid_from, valid_to, version, is_current)
    */
  def scd2(changes: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changePoints = changes
      .withColumn("_prev", lag(col(stateCol), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(stateCol))
    changePoints
      .select(
        col(keyCol),
        col(stateCol).as("state"),
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(w).as("valid_to"),
        row_number().over(w).as("version"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** q66: SCD-2 state history of each user's `event_type` over the
    * events stream — consecutive same-type events collapse into one
    * validity interval; the open interval is the current state. */
  def userStateHistory(spark: SparkSession, dir: String): DataFrame =
    scd2(
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id")),
      "user_id", "event_type", "ts", "event_id")

  val userStateHistorySql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |chg AS (
      |  SELECT user_id, event_type, ts, event_id FROM ordered
      |  WHERE prev IS NULL OR prev <> event_type),
      |versions AS (
      |  SELECT user_id, event_type AS state, ts AS valid_from,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |         AS INT) AS version
      |  FROM chg)
      |SELECT user_id, state, valid_from, valid_to, version,
      |  (valid_to IS NULL) AS is_current
      |FROM versions""".stripMargin
}
