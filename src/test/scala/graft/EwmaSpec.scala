package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Ewma

class EwmaSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Long, Double)]) =
    rows.toDF("user_id", "ts", "event_id", "value")

  private def run(rows: Seq[(Long, Long, Long, Double)], k: Int = 20) =
    Ewma.ewmaLast(ev(rows), "user_id", "ts", "event_id", "value", k)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).sortBy(_._1).toSeq

  test("hand case: adjusted EWMA(1/2) over three values") {
    // order by ts: 1.0, 2.0, 4.0 → newest first weights 1, 1/2, 1/4
    // ewma = (4 + 2*0.5 + 1*0.25) / (1 + 0.5 + 0.25) = 5.25 / 1.75 = 3.0
    val got = run(Seq((1L, 10L, 1L, 1.0), (1L, 20L, 2L, 2.0), (1L, 30L, 3L, 4.0)))
    assert(got == Seq((1L, 3L, 4.0, 3.0)))
  }

  test("single event: ewma equals the value") {
    val got = run(Seq((7L, 5L, 1L, 2.5)))
    assert(got == Seq((7L, 1L, 2.5, 2.5)))
  }

  test("events beyond the last k are dropped, not decayed") {
    // k=2: only the newest two (3.0 then 1.0) count:
    // (3 + 1*0.5)/(1.5) = 2.3333; the ancient 1000.0 is gone entirely
    val got = run(Seq((1L, 1L, 1L, 1000.0), (1L, 2L, 2L, 1.0), (1L, 3L, 3L, 3.0)),
      k = 2)
    assert(got.head._4 == 2.3333)
    assert(got.head._2 == 3L)
  }

  test("same-ts ties break by event_id: higher id is newer") {
    val got = run(Seq((1L, 10L, 1L, 0.0), (1L, 10L, 2L, 8.0)))
    assert(got.head._3 == 8.0) // last_value is the higher event_id
    // ewma = (8 + 0*0.5) / 1.5 = 5.3333
    assert(got.head._4 == 5.3333)
  }

  test("real events table: one row per user, ewma between min and max value") {
    val df = Ewma.userEwma(spark, "/root/testdata/sf0.001").cache()
    val users = Tables.events(spark, "/root/testdata/sf0.001")
      .select(countDistinct("user_id")).collect().head.getLong(0)
    assert(df.count() == users)
    val bad = df.join(
      Tables.events(spark, "/root/testdata/sf0.001")
        .groupBy("user_id").agg(
          expr("round(min(least(value, 0e0)) - 1e-4, 4)").as("lo"),
          expr("round(max(greatest(value, 0e0)) + 1e-4, 4)").as("hi")),
      "user_id")
      .filter(col("ewma") < col("lo") || col("ewma") > col("hi"))
    assert(bad.count() == 0)
  }
}
