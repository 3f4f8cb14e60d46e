package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Amoc

class AmocSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def ts(day: Int) =
    new Timestamp(86400000L * day + 3600000L) // day + 1h, UTC

  private def run(rows: Seq[(String, Timestamp, Double)]) =
    Amoc.meanShift(rows.toDF("k", "ts", "v"), "k", "ts", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).sortBy(_._1).toSeq

  test("clean level shift: changepoint at the last low day, exact means") {
    // days 0..4 at 10.0, days 5..9 at 50.0 → split after day 4
    val rows = (0 until 5).map(d => ("s", ts(d), 10.0)) ++
      (5 until 10).map(d => ("s", ts(d), 50.0))
    val Seq((_, nDays, cpDay, before, after, score)) = run(rows)
    assert(nDays == 10L)
    assert(cpDay == 4L)
    assert(before == 10.0 && after == 50.0)
    assert(score > 0.0)
  }

  test("flat series: score 0, earliest split elected by the tie rule") {
    val rows = (0 until 6).map(d => ("flat", ts(d), 7.0))
    val Seq((_, _, cpDay, before, after, score)) = run(rows)
    assert(score == 0.0)
    assert(cpDay == 0L) // all splits tie at q=0 → earliest day
    assert(before == 7.0 && after == 7.0)
  }

  test("single spike elects the sharpest boundary") {
    // 1,1,1,100,1,1 daily values: the max-Q split isolates the spike
    val vals = Seq(1.0, 1.0, 1.0, 100.0, 1.0, 1.0)
    val rows = vals.zipWithIndex.map { case (v, d) => ("spike", ts(d), v) }
    val Seq((_, _, cpDay, before, after, _)) = run(rows)
    // best 2-segment fit for a mid spike: boundary adjacent to day 3
    assert(cpDay == 2L || cpDay == 3L)
    assert(before != after)
  }

  test("multiple events per day aggregate before the election") {
    // day 0: 2×5.0 (sum 10); day 1: 10.0; day 2: 30.0 — shift after day 1
    val rows = Seq(("m", ts(0), 5.0), ("m", ts(0), 5.0), ("m", ts(1), 10.0),
      ("m", ts(2), 30.0))
    val Seq((_, nDays, cpDay, before, after, _)) = run(rows)
    assert(nDays == 3L)
    assert(cpDay == 1L)
    assert(before == 10.0 && after == 30.0)
  }

  test("real events: one row per type, split strictly inside the span") {
    val df = Amoc.eventTypeShift(spark, "/root/testdata/sf0.001").cache()
    assert(df.count() == 5)
    assert(df.filter(col("score") < 0.0).count() == 0)
    assert(df.filter(col("mean_before").isNull || col("mean_after").isNull)
      .count() == 0)
  }
}
