package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-decay multi-touch attribution — the FRACTIONAL-credit answer
  * to the question q80's last-touch settles by fiat. Last-touch hands
  * the whole conversion to one event; time-decay splits each
  * conversion's credit across EVERY in-window touch with weight
  * e^(−Δt/τ), normalized per conversion — the standard compromise
  * between last-touch (recency is everything) and linear (recency is
  * nothing). τ = 2 days: a touch loses ~63% of its pull every two
  * days of staleness.
  *
  * Exactness: Δt is an exact integer second count; each weight
  * exp(−Δt/τ) is 1e-9-floored to integer nano-units so the per-
  * conversion normalizer is an exact integer sum (order-free); each
  * pair's revenue credit floor(rev_fixed·w/W) and share floor(w·1e9/W)
  * are exact integers, so the channel rollup sums integers only.
  * Conversions with no in-window touch get full integer credit as
  * `organic` (the q80 contract).
  *
  * Plan/scale: purchases × touches is a PER-USER time-range join
  * (user-key shuffle + the 7-day bound — pairs bounded by per-user
  * activity in one week, the q76 funnel class, never a global
  * product), one keyed normalizer aggregate joined back, one channel
  * rollup, and an anti-join for the organic row. */
object TimeDecay {

  /** Lookback (q80's contract) and decay half-life scale. */
  val LookbackDays = 7
  val TauSeconds = 172800L // 2 days

  /** Time-decay attribution over (user_id, ts, event_id, event_type,
    * value). One row per credited channel (+ `organic`):
    * (touch_type, n_pairs, conversions, revenue). */
  def timeDecay(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type"), col("value"))
      .localCheckpoint(true) // purchases + touches + anti-join
    val purchases = ev.filter(col("event_type") === "purchase")
      .selectExpr("user_id", "ts AS pts", "event_id AS pid",
        "CAST(floor(coalesce(value, 0) * 10000) AS BIGINT) AS rev_fixed")
    val touches = ev
      .filter(col("event_type").isin("view", "click", "signup"))
      .selectExpr("user_id", "ts AS tts", "event_type AS touch_type")
    val pairs = purchases
      .join(touches, Seq("user_id"))
      .filter(expr(s"tts <= pts AND tts >= pts - INTERVAL $LookbackDays DAYS"))
      .withColumn("w_nano", expr(
        "CAST(floor(exp(-(CAST(unix_timestamp(pts) - unix_timestamp(tts)" +
          s" AS DOUBLE) / $TauSeconds.0)) * 1e9) AS BIGINT)"))
      .localCheckpoint(true) // normalizer + rollup + organic anti-join
    val norm = pairs.groupBy("user_id", "pid")
      .agg(expr("CAST(sum(w_nano) AS BIGINT)").as("w_sum"))
    val credited = pairs
      .join(norm, Seq("user_id", "pid"))
      .groupBy("touch_type")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_pairs"),
        expr("CAST(sum(CAST(floor(CAST(w_nano AS DOUBLE) * 1e9" +
          " / CAST(w_sum AS DOUBLE)) AS BIGINT)) AS BIGINT)").as("share_n"),
        expr("CAST(sum(CAST(floor(CAST(rev_fixed AS DOUBLE)" +
          " * CAST(w_nano AS DOUBLE) / CAST(w_sum AS DOUBLE)) AS BIGINT))" +
          " AS BIGINT)").as("rev_n"))
    val organic = purchases
      .join(pairs.select("user_id", "pid").distinct(),
        Seq("user_id", "pid"), "left_anti")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_pairs"),
        expr("CAST(count(1) * 1000000000 AS BIGINT)").as("share_n"),
        expr("CAST(sum(rev_fixed) AS BIGINT)").as("rev_n"))
      .selectExpr("'organic' AS touch_type", "n_pairs", "share_n", "rev_n")
      .filter(col("n_pairs") > 0)
    credited.unionByName(organic)
      .selectExpr("touch_type", "n_pairs",
        "round(CAST(share_n AS DOUBLE) / 1e9, 4) + 0.0 AS conversions",
        "round(CAST(rev_n AS DOUBLE) / 1e4, 4) + 0.0 AS revenue")
  }

  /** q294: the q80 events frame under fractional time-decay credit —
    * read beside q80 to see how much revenue last-touch was handing
    * to the final click. */
  def eventTimeDecay(spark: SparkSession, dir: String): DataFrame =
    timeDecay(Tables.events(spark, dir))

  /** DuckDB twin: identical pairs, integer weights, floored credits. */
  val eventTimeDecaySql: String =
    s"""WITH purchases AS (
       |  SELECT user_id, ts AS pts, event_id AS pid,
       |    CAST(floor(coalesce(value, 0) * 10000) AS BIGINT) AS rev_fixed
       |  FROM events WHERE event_type = 'purchase'),
       |touches AS (
       |  SELECT user_id, ts AS tts, event_type AS touch_type
       |  FROM events WHERE event_type IN ('view', 'click', 'signup')),
       |pairs AS (
       |  SELECT p.user_id, pid, rev_fixed, touch_type,
       |    CAST(floor(exp(-(CAST(date_diff('second', tts, pts)
       |      AS DOUBLE) / $TauSeconds.0)) * 1e9) AS BIGINT) AS w_nano
       |  FROM purchases p JOIN touches t ON p.user_id = t.user_id
       |  WHERE tts <= pts AND tts >= pts - INTERVAL $LookbackDays DAY),
       |norm AS (
       |  SELECT user_id, pid, CAST(sum(w_nano) AS BIGINT) AS w_sum
       |  FROM pairs GROUP BY 1, 2),
       |credited AS (
       |  SELECT touch_type, CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(CAST(floor(CAST(w_nano AS DOUBLE) * 1e9
       |      / CAST(w_sum AS DOUBLE)) AS BIGINT)) AS BIGINT) AS share_n,
       |    CAST(sum(CAST(floor(CAST(rev_fixed AS DOUBLE)
       |      * CAST(w_nano AS DOUBLE) / CAST(w_sum AS DOUBLE)) AS BIGINT))
       |      AS BIGINT) AS rev_n
       |  FROM pairs JOIN norm USING (user_id, pid)
       |  GROUP BY 1),
       |organic AS (
       |  SELECT 'organic' AS touch_type,
       |    CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(count(*) * 1000000000 AS BIGINT) AS share_n,
       |    CAST(sum(rev_fixed) AS BIGINT) AS rev_n
       |  FROM purchases p
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM pairs
       |    WHERE pairs.user_id = p.user_id AND pairs.pid = p.pid)
       |  HAVING count(*) > 0),
       |unioned AS (
       |  SELECT * FROM credited UNION ALL SELECT * FROM organic)
       |SELECT touch_type, n_pairs,
       |  round(CAST(share_n AS DOUBLE) / 1e9, 4) + 0.0 AS conversions,
       |  round(CAST(rev_n AS DOUBLE) / 1e4, 4) + 0.0 AS revenue
       |FROM unioned""".stripMargin
}
