package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Attribution

/** Last-touch attribution rules on planted event paths. Value-level
  * equivalence vs DuckDB runs through graft.Verify. */
class AttributionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def ts(h: Int) = Timestamp.valueOf(f"2026-01-10 $h%02d:00:00")
  private def day(d: Int) = Timestamp.valueOf(f"2026-01-$d%02d 12:00:00")

  private def run(rows: Seq[(Long, Timestamp, Long, String, java.lang.Double)]) = {
    import spark.implicits._
    Attribution.lastTouch(
      rows.toDF("user_id", "ts", "event_id", "event_type", "value"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
  }

  test("credits the most recent in-window touch, not the first") {
    val got = run(Seq(
      (1L, ts(1), 10L, "view", null),
      (1L, ts(2), 11L, "click", null),
      (1L, ts(3), 12L, "purchase", Double.box(100.5))))
    assert(got == Map("click" -> ((1L, 100.5))))
  }

  test("touch outside the lookback books as organic; inside credits") {
    val got = run(Seq(
      (1L, day(1), 10L, "click", null),
      (1L, day(9), 11L, "purchase", Double.box(10.0)),  // 8 days: stale
      (2L, day(3), 20L, "signup", null),
      (2L, day(9), 21L, "purchase", Double.box(20.0)))) // 6 days: credited
    assert(got == Map("organic" -> ((1L, 10.0)), "signup" -> ((1L, 20.0))))
  }

  test("no prior touch at all is organic; other users' touches never leak") {
    val got = run(Seq(
      (1L, ts(1), 10L, "view", null),
      (2L, ts(2), 20L, "purchase", Double.box(5.0)),
      (3L, ts(1), 30L, "error", null), // non-touch event type is ignored
      (3L, ts(2), 31L, "purchase", Double.box(7.0))))
    assert(got == Map("organic" -> ((2L, 12.0))))
  }

  test("equal timestamps: event_id breaks the tie deterministically") {
    val got = run(Seq(
      (1L, ts(1), 11L, "view", null),
      (1L, ts(1), 12L, "click", null), // same ts, higher id -> the last touch
      (1L, ts(2), 13L, "purchase", Double.box(1.0))))
    assert(got == Map("click" -> ((1L, 1.0))))
  }

  test("a purchase between touches resets nothing: later purchase still credited") {
    val got = run(Seq(
      (1L, ts(1), 10L, "click", null),
      (1L, ts(2), 11L, "purchase", Double.box(1.0)),
      (1L, ts(3), 12L, "purchase", Double.box(2.0)))) // same click credited twice
    assert(got == Map("click" -> ((2L, 3.0))))
  }

  test("q80 over testdata: conversions conserve purchases, revenue is finite") {
    val df = Attribution.lastTouch(spark, "/root/testdata/sf0.001").cache()
    val purchases = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .count()
    val n = df.agg(org.apache.spark.sql.functions.sum("n_conversions"))
      .head.getLong(0)
    assert(n == purchases)
    assert(df.collect().forall(r => !r.getDouble(2).isNaN))
  }
}
