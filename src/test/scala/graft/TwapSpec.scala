package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Twap

/** TWAP invariants. Value-level oracle equivalence runs through
  * graft.Verify. */
class TwapSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def twap(rows: Seq[(String, Long, Long, Double)]) = {
    import spark.implicits._
    val df = rows.map { case (g, tie, sec, v) =>
      (g, tie, new Timestamp(sec * 1000L), v)
    }.toDF("g", "tie", "ts", "v")
    Twap.timeWeightedAvg(df, "g", "ts", "tie", "v").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
  }

  test("hand case: long-held values dominate the oversampled mean") {
    // 10 held 10s, 20 held 20s, final sample carries no weight
    val got = twap(Seq(("u", 1L, 0L, 10.0), ("u", 2L, 10L, 20.0),
      ("u", 3L, 30L, 999.0)))
    val (n, ni, span, tw) = got("u")
    assert((n, ni, span) == ((3L, 2L, 30.0)))
    assert(tw.get == 16.666667) // (10*10 + 20*20) / 30
  }

  test("single event: no closed interval -> NULL twap") {
    val got = twap(Seq(("u", 1L, 0L, 42.0)))
    assert(got("u") == ((1L, 0L, 0.0, None)))
  }

  test("constant signal: twap equals the value under ANY sampling") {
    val regular = twap((0L until 10L).map(i => ("u", i, i * 60L, 7.25)))
    val bursty = twap(Seq(0L, 1L, 2L, 3L, 300L, 301L, 302L, 540L)
      .zipWithIndex.map { case (s, i) => ("u", i.toLong, s, 7.25) })
    assert(regular("u")._4.get == 7.25)
    assert(bursty("u")._4.get == 7.25)
  }

  test("equal-timestamp ties carry zero weight and cannot reorder the sums") {
    val a = twap(Seq(("u", 1L, 0L, 10.0), ("u", 2L, 5L, 99.0),
      ("u", 3L, 5L, 20.0), ("u", 4L, 15L, 0.0)))
    // 10 held 5s, the tie pair (99 @5, dt=0) then 20 held 10s
    assert(a("u")._4.get == 16.666667) // (10*5 + 99*0 + 20*10) / 15
  }

  test("q113 over testdata: weights positive, spans finite, per-user rows") {
    val rows = Twap.userTwap(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, ni) = (r.getLong(1), r.getLong(2))
      assert(ni == n - 1 || ni == 0 || ni < n)
      assert(r.getDouble(3) >= 0.0)
    }
  }
}
