package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Seasonality

class SeasonalitySpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def ts(day: String) = Timestamp.valueOf(s"$day 12:00:00")

  private def run(rows: Seq[(String, Timestamp, Double)]) =
    Seasonality.dowProfile(rows.toDF("k", "ts", "v"), "k", "ts", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(t => (t._1, t._2)).toSeq

  test("epoch anchor: 1970-01-01 is Thursday (dow 4), Sunday is 0") {
    val got = run(Seq(
      ("a", ts("1970-01-01"), 1.0),  // Thursday → 4
      ("a", ts("1970-01-04"), 1.0),  // Sunday → 0
      ("a", ts("1970-01-05"), 1.0))) // Monday → 1
    assert(got.map(_._2) == Seq(0L, 1L, 4L))
  }

  test("hand case: hot weekday gets index > 1, shares sum to 1") {
    // Mondays avg 30, Tuesdays avg 10 → overall avg 20;
    // Monday index 1.5, Tuesday 0.5
    val got = run(Seq(
      ("a", ts("2024-01-01"), 30.0), ("a", ts("2024-01-08"), 30.0), // Mondays
      ("a", ts("2024-01-02"), 10.0), ("a", ts("2024-01-09"), 10.0))) // Tuesdays
    assert(got.map(_._2) == Seq(1L, 2L))
    assert(got.map(_._5) == Seq(1.5, 0.5))
    assert(got.map(_._4).sum == 1.0)
  }

  test("zero-total series: index is NULL, not a crash") {
    val df = Seasonality.dowProfile(
      Seq(("z", ts("2024-01-01"), 0.0)).toDF("k", "ts", "v"), "k", "ts", "v")
    val r = df.collect().head
    assert(r.isNullAt(r.fieldIndex("seasonal_index")))
    assert(r.getDouble(r.fieldIndex("share")) == 1.0)
  }

  test("real events: ≤7 rows per type, shares sum to 1 per type") {
    val df = Seasonality.eventTypeDow(spark, "/root/testdata/sf0.001").cache()
    val perType = df.groupBy("event_type")
      .agg(count(lit(1)).as("n"), expr("round(sum(share), 2)").as("s"))
      .collect()
    assert(perType.forall(_.getLong(1) <= 7))
    assert(perType.forall(r => math.abs(r.getDouble(2) - 1.0) < 0.02))
    assert(df.filter(col("dow") < 0 || col("dow") > 6).count() == 0)
  }
}
