package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM equi-join (r14 verdict #6 — the one
  * Structured Streaming staple the 30 twins lacked a row for; every
  * prior join twin was stream-static). The shape is funnel
  * attribution: an impression stream joins a conversion stream on
  * user_id within an event-time window — two LIVE feeds, neither of
  * which can be broadcast or treated as a dimension.
  *
  * STATE BOUND (the reason this operator is runnable forever): with
  * both sides watermarked at `watermark` and the join condition
  * bounding conversion time to [impression ts, ts + horizon], Spark
  * retains an impression only until the watermark passes
  * ts + horizon, and a conversion only until the watermark passes its
  * cts — buffered state is O(rows inside the late-data horizon +
  * attribution window), NEVER O(stream history). An unconstrained
  * stream-stream join (no time bound) would buffer both streams
  * FOREVER — the time-range predicate is not an optimization, it is
  * what makes the state finite. Late rows (event time older than the
  * watermark on arrival) are dropped by contract; JoinStreamSpec pins
  * both the replay-equivalence and the late-drop behavior.
  *
  * TWIN CONTRACT: this is ONE code path for both engines — on batch
  * frames `withWatermark` is a no-op and the same join text runs as a
  * plain range join, so `attributionJoin(batchImps, batchConvs)` IS
  * the batch twin the spec compares the replay against (no second
  * implementation to drift).
  *
  * Input schemas: impressions (user_id LONG, event_id LONG,
  * ts TIMESTAMP), conversions (c_user_id LONG, conv_id LONG,
  * value DOUBLE, cts TIMESTAMP) — disjoint names because
  * stream-stream joins forbid ambiguous columns across sides.
  */
object JoinStream {

  /** Attribution window: a conversion attributes to every impression
    * of the same user in the preceding `horizon`. */
  val DefaultHorizon = "4 hours"

  def attributionJoin(imps: DataFrame, convs: DataFrame,
      watermark: String = "1 hour",
      horizon: String = DefaultHorizon): DataFrame = {
    val i = imps.withWatermark("ts", watermark)
    val c = convs.withWatermark("cts", watermark)
    i.join(c,
      col("user_id") === col("c_user_id") &&
        col("cts") >= col("ts") &&
        col("cts") <= col("ts") + expr(s"INTERVAL $horizon"),
      "inner")
      .select(col("user_id"), col("event_id"), col("conv_id"),
        col("value"), col("ts"), col("cts"))
  }

  /** The impression/conversion split of the `events` table the spec
    * replays: every event is an impression; purchases are the
    * conversion stream (self-pairs excluded by conv_id ≠ event_id in
    * the consumer — kept out of the join condition so the join state
    * stays a pure (key, time) contract). */
  def impressionsOf(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_id"), col("ts"))

  def conversionsOf(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("c_user_id"), col("event_id").as("conv_id"),
        col("value"), col("ts").as("cts"))
}
