package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q76 invariants. Value-level equivalence vs the DuckDB twin runs
  * through graft.Verify + tools/verify_local.py. */
class FunnelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stage machine: order, window, and strictness rules") {
    import spark.implicits._
    val events = Seq(
      // user 1: full in-order funnel inside the window -> stage 3
      (1L, 1L, "view", ts("2024-01-01 00:00:00")),
      (1L, 2L, "click", ts("2024-01-02 00:00:00")),
      (1L, 3L, "purchase", ts("2024-01-03 00:00:00")),
      // user 2: click BEFORE the first view -> only stage 1
      (2L, 4L, "click", ts("2024-01-01 00:00:00")),
      (2L, 5L, "view", ts("2024-01-02 00:00:00")),
      // user 3: click past the 7-day window -> stage 1
      (3L, 6L, "view", ts("2024-01-01 00:00:00")),
      (3L, 7L, "click", ts("2024-01-09 00:00:01")),
      // user 4: purchase before click -> stage 2 (click accepted, no
      // purchase after it)
      (4L, 8L, "view", ts("2024-01-01 00:00:00")),
      (4L, 9L, "purchase", ts("2024-01-02 00:00:00")),
      (4L, 10L, "click", ts("2024-01-03 00:00:00")),
      // user 5: no view at all -> stage 0, null anchor
      (5L, 11L, "purchase", ts("2024-01-01 00:00:00")),
      // user 6: purchase at the exact window edge -> stage 3 (<= bound)
      (6L, 12L, "view", ts("2024-01-01 00:00:00")),
      (6L, 13L, "click", ts("2024-01-02 00:00:00")),
      (6L, 14L, "purchase", ts("2024-01-08 00:00:00")),
      // user 7: a NULL-time view must not anchor (and must not stall
      // the real funnel that follows)
      (7L, 15L, "view", null.asInstanceOf[Timestamp]),
      (7L, 16L, "view", ts("2024-02-01 00:00:00")),
      (7L, 17L, "click", ts("2024-02-02 00:00:00")),
      (7L, 18L, "purchase", ts("2024-02-03 00:00:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = operators.Funnel.windowFunnelOn(events)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), Option(r.getTimestamp(2))))).toMap
    assert(got(1L) == ((3, Some(ts("2024-01-01 00:00:00")))))
    assert(got(2L) == ((1, Some(ts("2024-01-02 00:00:00")))))
    assert(got(3L) == ((1, Some(ts("2024-01-01 00:00:00")))))
    assert(got(4L) == ((2, Some(ts("2024-01-01 00:00:00")))))
    assert(got(5L) == ((0, None)))
    assert(got(6L) == ((3, Some(ts("2024-01-01 00:00:00")))))
    assert(got(7L) == ((3, Some(ts("2024-02-01 00:00:00")))))
  }

  test("q76 shape: one row per user, stages within 0..3, one shuffle") {
    val out = operators.Funnel.windowFunnel(spark, dir).cache()
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(out.count() == users)
    assert(out.filter(col("stage") < 0 || col("stage") > 3).count() == 0)
    assert(out.filter(col("stage") === 0 && col("anchor_ts").isNotNull).count() == 0)
    val plan = operators.Funnel.windowFunnel(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    out.unpersist()
  }
}
