package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.FunnelTime

class FunnelTimeSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def run(rows: Seq[(Long, Timestamp, String)],
                  steps: Seq[String] = Seq("view", "click", "purchase")) =
    FunnelTime.stepTimes(rows.toDF("k", "ts", "t"), "k", "ts", "t", steps)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).sortBy(_._1).toSeq

  test("hand case: strict sequential first-passage gaps") {
    // user 1: view@10, click@40 (gap 30), purchase@100 (gap 60)
    // user 2: click@5 BEFORE any view — not a conversion; view@20,
    //         click@50 (gap 30), no purchase
    val rows = Seq(
      (1L, ts(10), "view"), (1L, ts(40), "click"), (1L, ts(100), "purchase"),
      (2L, ts(5), "click"), (2L, ts(20), "view"), (2L, ts(50), "click"))
    val got = run(rows)
    assert(got == Seq(
      ("click>purchase", 1L, 60L, 60L, 60.0),
      ("view>click", 2L, 30L, 30L, 30.0)))
  }

  test("first passage uses the FIRST qualifying event, not the closest") {
    // view@10; clicks at 40 and 20 → first click after view is 20
    val rows = Seq(
      (1L, ts(10), "view"), (1L, ts(40), "click"), (1L, ts(20), "click"))
    val got = run(rows)
    assert(got == Seq(("view>click", 1L, 10L, 10L, 10.0)))
  }

  test("median is the lower median, p90 the exact order statistic") {
    // gaps 10, 20, 30, 40 (4 users): median = 2nd = 20; p90 = ceil(3.6)=4th = 40
    val rows = (1 to 4).flatMap { u =>
      Seq((u.toLong, ts(0), "view"), (u.toLong, ts(u * 10L), "click"))
    }
    val got = run(rows, Seq("view", "click"))
    assert(got == Seq(("view>click", 4L, 20L, 40L, 25.0)))
  }

  test("non-converting users appear in no pair") {
    val rows = Seq((1L, ts(10), "view"), (2L, ts(10), "purchase"))
    assert(run(rows).isEmpty)
  }

  test("real events: both pairs present, median ≤ p90, counts consistent") {
    val df = FunnelTime.eventStepTimes(spark, "/root/testdata/sf0.001").cache()
    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("view>click", "click>purchase"))
    assert(df.filter(col("median_gap_s") > col("p90_gap_s")).count() == 0)
    // strictly-sequential conversion can only shrink down the funnel
    assert(rows("click>purchase").getLong(1) <= rows("view>click").getLong(1))
  }
}
