package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of [[graft.operators.Events]]: the same
  * hourly rollup and sessionization, incrementally maintained. The
  * reference's "daily Airflow re-run" becomes a continuously-updated
  * result with bounded state:
  *   - watermarks cap how late data may arrive, so window state is
  *     dropped once the watermark passes (no unbounded state at 100 TB/day);
  *   - sessionization keeps one small state record per active user and
  *     emits the session when the gap timeout fires.
  */
object EventStream {

  /** Streaming exact dedup — the continuous-ingest twin of
    * [[graft.dedup.Dedup.dedupExact]]: keep the first document per
    * content hash, with state bounded by the watermark
    * (`dropDuplicatesWithinWatermark` drops a key's state once the
    * watermark passes it — a 100 TB/day crawl can run this forever,
    * deduping within the late-data horizon without unbounded memory).
    * Input: streaming frame with (ts TIMESTAMP, text STRING, ...).
    */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Hourly tumbling counts per event type over a streaming frame of
    * (ts TIMESTAMP, event_type STRING, value DOUBLE).
    */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  /** Gap-based streaming sessionization with explicit state: emits a
    * Session row once a user has been idle past `gapMs`, detected
    * either by a newer event from the same user or by the event-time
    * watermark passing the session's expiry. Event-time timeout keeps
    * state bounded by the watermark and avoids the busy-loop of
    * processing-time cleanup batches on an idle stream.
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
