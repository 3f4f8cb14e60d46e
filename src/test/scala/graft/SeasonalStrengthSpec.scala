package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.SeasonalStrength

class SeasonalStrengthSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def ts(day: String) = Timestamp.valueOf(s"$day 12:00:00")

  private def run(rows: Seq[(String, Timestamp, Double)]) =
    SeasonalStrength.dowStrength(rows.toDF("k", "ts", "v"), "k", "ts", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).sortBy(_._1).toSeq

  test("pure weekday signal: eta_sq = 1 (dow explains everything)") {
    // Mondays always 30, Tuesdays always 10 — zero within-dow variance
    val got = run(Seq(
      ("a", ts("2024-01-01"), 30.0), ("a", ts("2024-01-08"), 30.0),
      ("a", ts("2024-01-02"), 10.0), ("a", ts("2024-01-09"), 10.0)))
    val (_, n, dows, variance, eta) = got.head
    assert(n == 4L && dows == 2L)
    assert(variance == 100.0) // values 30,30,10,10 → var 100
    assert(eta == 1.0)
  }

  test("dow-independent variation: eta_sq = 0 (same spread every day)") {
    // each dow sees the identical {10, 30} pair → SSW = SST
    val got = run(Seq(
      ("b", ts("2024-01-01"), 10.0), ("b", ts("2024-01-08"), 30.0),
      ("b", ts("2024-01-02"), 10.0), ("b", ts("2024-01-09"), 30.0)))
    assert(got.head._5 == 0.0)
  }

  test("constant series: SST = 0 → eta NULL, not a division error") {
    val got = run(Seq(
      ("c", ts("2024-01-01"), 5.0), ("c", ts("2024-01-02"), 5.0)))
    assert(got.head._5.isNaN)
    assert(got.head._4 == 0.0)
  }

  test("partial signal lands strictly between 0 and 1") {
    val got = run(Seq(
      ("d", ts("2024-01-01"), 30.0), ("d", ts("2024-01-08"), 20.0),
      ("d", ts("2024-01-02"), 10.0), ("d", ts("2024-01-09"), 12.0)))
    assert(got.head._5 > 0.0 && got.head._5 < 1.0)
  }

  test("real events: five rows, eta in [0,1], uniform feed reads weak") {
    val df = SeasonalStrength.eventTypeStrength(spark, "/root/testdata/sf0.001")
      .cache()
    assert(df.count() == 5)
    assert(df.filter(col("eta_sq") < 0.0 || col("eta_sq") > 1.0).count() == 0)
    // the synthetic feed has no weekly signal: eta should be small
    assert(df.filter(col("eta_sq") > 0.5).count() == 0)
  }
}
