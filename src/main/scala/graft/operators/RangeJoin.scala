package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Interval (range) join — the second join shape Spark lacks natively
  * (a naive `p.ts BETWEEN i.start AND i.end` condition plans as a
  * nested-loop/broadcast-theta join: quadratic, a 100 TB non-starter).
  *
  * Same cure as [[Geo.gridJoin]] in one dimension: intervals explode to
  * the time buckets they span, points hash to exactly one bucket, and
  * the join becomes an equi-join on (keys, bucket) followed by the
  * exact containment test. Shuffle is O(points + intervals·span/bucket);
  * a point matches an interval in exactly one bucket (its own), so no
  * dedupe. Size `bucketSeconds` near the typical interval length so
  * each interval covers O(1) buckets. */
object RangeJoin {

  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointTs: String, startTs: String, endTs: String,
      bucketSeconds: Long): DataFrame = {
    val cells = intervals.withColumn("__cell", explode(sequence(
      floor(col(startTs).cast("long") / bucketSeconds),
      floor(col(endTs).cast("long") / bucketSeconds))))
    val keyed = points.withColumn("__cell",
      floor(col(pointTs).cast("long") / bucketSeconds))
    keyed.join(cells, keys :+ "__cell")
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("__cell")
  }

  /** Naive theta-join twin (parity oracle; small inputs only). */
  private[graft] def naiveJoin(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointTs: String, startTs: String, endTs: String): DataFrame =
    keys.foldLeft(
      points.join(intervals,
        keys.map(k => points(k) === intervals(k)).reduce(_ && _)
          && points(pointTs) >= intervals(startTs) && points(pointTs) <= intervals(endTs))
    )((d, k) => d.drop(intervals(k)))

  // ---- q36: measure events inside per-user error windows ----

  /** Every `error` event opens a 30-minute incident window; count and
    * sum the user's measure events (click/view/purchase) inside each
    * window. Windows overlap when errors cluster — the genuinely
    * many-to-many range-join case. */
  def rangeEventWindows(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val iv = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("end_ts"))
    val m = ev.filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id"), col("ts"), col("value"))
    rangeJoin(m, iv, Seq("user_id"), "ts", "start_ts", "end_ts", 1800L)
      .groupBy(col("user_id"), col("start_ts"))
      .agg(count(lit(1)).as("n_events"),
        (round(sum(col("value")), 4) + 0.0).as("sum_value"))
  }

  /** DuckDB twin via the plain BETWEEN theta join (identical result set
    * to the bucketed plan). */
  val rangeEventWindowsSql: String =
    """WITH iv AS (
      |  SELECT user_id, ts AS start_ts, ts + INTERVAL 30 MINUTE AS end_ts
      |  FROM events WHERE event_type = 'error'),
      |m AS (
      |  SELECT user_id, ts, value FROM events
      |  WHERE event_type IN ('click', 'view', 'purchase'))
      |SELECT iv.user_id, iv.start_ts,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  round(sum(m.value), 4) + 0.0 AS sum_value
      |FROM iv JOIN m ON m.user_id = iv.user_id
      |  AND m.ts >= iv.start_ts AND m.ts <= iv.end_ts
      |GROUP BY iv.user_id, iv.start_ts""".stripMargin
}
