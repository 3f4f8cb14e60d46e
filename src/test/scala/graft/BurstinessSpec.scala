package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Burstiness

class BurstinessSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def ts(day: String) = Timestamp.valueOf(s"$day 06:00:00")

  private def run(rows: Seq[(String, Timestamp)]) =
    Burstiness.dailyDispersion(rows.toDF("k", "ts"), "k", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .sortBy(_._1).toSeq

  test("constant one-per-day series: fano 0, burstiness -1") {
    val rows = (1 to 5).map(i => ("steady", ts(f"2024-01-$i%02d")))
    val Seq((_, span, active, n, mean, fano, b)) = run(rows)
    assert((span, active, n) == (5L, 5L, 5L))
    assert(mean == 1.0 && fano == 0.0 && b == -1.0)
  }

  test("one burst day inside a span: zero days count, hand variance") {
    // span 2024-01-01..01-05 (D=5), all 10 events on day 3:
    // mean 2; var = (Σc² ·D − S1²)/D² = (100·5 − 100)/25 = 16; fano 8
    // burstiness = (sqrt(400)−10)/(sqrt(400)+10) = 10/30 = 0.3333
    val rows = Seq(("burst", ts("2024-01-01")), ("burst", ts("2024-01-05"))) ++
      (1 to 8).map(_ => ("burst", ts("2024-01-03")))
    val Seq((_, span, active, n, mean, fano, b)) = run(rows)
    assert((span, active, n) == (5L, 3L, 10L))
    assert(mean == 2.0)
    // S2 = 1 + 64 + 1 = 66; num = 5·66 − 100 = 230; fano = 230/(5·10) = 4.6
    assert(fano == 4.6)
    // b = (sqrt(230) − 10)/(sqrt(230) + 10)
    val e = (math.sqrt(230.0) - 10) / (math.sqrt(230.0) + 10)
    assert(math.abs(b - e) < 1e-4)
  }

  test("series are independent") {
    val rows = (1 to 3).map(i => ("a", ts(f"2024-01-$i%02d"))) ++
      (1 to 9).map(_ => ("b", ts("2024-01-01")))
    val got = run(rows)
    assert(got.map(_._1) == Seq("a", "b"))
    assert(got(0)._6 == 0.0) // a is steady
    assert(got(1)._2 == 1L)  // b's span is one day
  }

  test("real events: Poisson-ish arrivals, fano near 1 band, B in [-1,1)") {
    val df = Burstiness.eventTypeDispersion(spark, "/root/testdata/sf0.001")
      .cache()
    assert(df.count() == 5)
    assert(df.filter(col("fano") < 0.0).count() == 0)
    assert(df.filter(col("burstiness") < -1.0 ||
      col("burstiness") >= 1.0).count() == 0)
    assert(df.filter(col("active_days") > col("span_days")).count() == 0)
  }
}
