package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.TimeDecay

/** Time-decay attribution (q294): conservation of credit, recency
  * ordering, the organic fallback, window exclusion, and the
  * registered shape. Value-level oracle equivalence runs through
  * graft.Verify. */
class TimeDecaySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def ts(hoursFromEpoch: Long): Timestamp =
    new Timestamp(hoursFromEpoch * 3600 * 1000L)

  private def run(rows: Seq[(Long, Timestamp, Long, String, Double)]) = {
    import spark.implicits._
    TimeDecay.timeDecay(
      rows.toDF("user_id", "ts", "event_id", "event_type", "value")
        .repartition(4))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("credit conserves: shares across channels sum to the conversion count") {
    val rows = Seq(
      (1L, ts(0), 1L, "view", 0.0),
      (1L, ts(10), 2L, "click", 0.0),
      (1L, ts(20), 3L, "purchase", 100.0),
      (2L, ts(5), 4L, "signup", 0.0),
      (2L, ts(6), 5L, "purchase", 50.0))
    val m = run(rows)
    val shares = m.values.map(_.getDouble(2)).sum
    assert(math.abs(shares - 2.0) < 1e-3) // 2 conversions, credit split
    val rev = m.values.map(_.getDouble(3)).sum
    assert(math.abs(rev - 150.0) < 1e-2)
  }

  test("recency wins: the fresher touch gets the larger share") {
    val rows = Seq(
      (1L, ts(0), 1L, "view", 0.0),     // 20h stale
      (1L, ts(18), 2L, "click", 0.0),   // 2h stale
      (1L, ts(20), 3L, "purchase", 100.0))
    val m = run(rows)
    assert(m("click").getDouble(3) > m("view").getDouble(3))
    // exact ratio: e^(-2h/48h) vs e^(-20h/48h) → click/view = e^(18/48)
    val ratio = m("click").getDouble(3) / m("view").getDouble(3)
    assert(math.abs(ratio - math.exp(18.0 * 3600 / 172800)) < 1e-3)
  }

  test("no in-window touch: full organic credit") {
    val rows = Seq(
      (1L, ts(0), 1L, "view", 0.0),
      (1L, ts(24 * 10), 2L, "purchase", 70.0)) // touch 10 days stale
    val m = run(rows)
    assert(m.keySet == Set("organic"))
    assert(m("organic").getDouble(2) == 1.0)
    assert(m("organic").getDouble(3) == 70.0)
  }

  test("touches after the purchase get nothing") {
    val rows = Seq(
      (1L, ts(5), 1L, "click", 0.0),
      (1L, ts(2), 2L, "purchase", 30.0))
    val m = run(rows)
    assert(m.keySet == Set("organic"))
  }

  test("registered shape over events: channels plus organic, all positive") {
    val df = TimeDecay.eventTimeDecay(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq ==
      Seq("touch_type", "n_pairs", "conversions", "revenue"))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("conversions")) >= 0.0)
    }
  }
}
