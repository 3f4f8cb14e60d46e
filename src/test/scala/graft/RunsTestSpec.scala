package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.RunsTest

class RunsTestSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def ts(day: Int) = new Timestamp(86400000L * day + 3600000L)

  private def series(vals: Seq[Double], k: String = "s") =
    vals.zipWithIndex.map { case (v, d) => (k, ts(d), v) }

  private def run(rows: Seq[(String, Timestamp, Double)]) =
    RunsTest.dailyRuns(rows.toDF("k", "ts", "v"), "k", "ts", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4),
        if (r.isNullAt(5)) Double.NaN else r.getDouble(5)))
      .sortBy(_._1).toSeq

  test("perfect alternation: maximum runs, positive z") {
    // 1,2,1,2,1,2,1,2,1 → moves + - + - + - + -, 8 moves, 8 runs
    val Seq((_, up, dn, runs, z, p)) = run(series(
      Seq(1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0)))
    assert((up, dn, runs) == (4L, 4L, 8L))
    // mu = 2*16/8+1 = 5; var = 32*(32-8)/(64*7) = 12/7; z = 3/sqrt(12/7)
    val e = 3.0 / math.sqrt(12.0 / 7.0)
    assert(math.abs(z - e) < 1e-3)
    assert(p < 0.05)
  }

  test("one long trend: minimum runs, negative z") {
    // strictly increasing: all moves +, 1 run — one-direction → NULL z
    val Seq((_, up, dn, runs, z, _)) = run(series((1 to 9).map(_.toDouble)))
    assert((up, dn, runs) == (8L, 0L, 1L))
    assert(z.isNaN) // sigma undefined with one category
  }

  test("two regimes: down-run then up-run gives 2 runs, z < 0") {
    // 5,4,3,2,1,2,3,4,5 → moves ----++++ → 2 runs
    val Seq((_, up, dn, runs, z, _)) = run(series(
      Seq(5.0, 4.0, 3.0, 2.0, 1.0, 2.0, 3.0, 4.0, 5.0)))
    assert((up, dn, runs) == (4L, 4L, 2L))
    assert(z < 0)
  }

  test("zero-change days are excluded from the move sequence") {
    // 1,1,2,2,3 → diffs 0,+,0,+ → moves ++ → 1 run, up=2
    val Seq((_, up, dn, runs, _, _)) = run(series(Seq(1.0, 1.0, 2.0, 2.0, 3.0)))
    assert((up, dn, runs) == (2L, 0L, 1L))
  }

  test("same-day events aggregate before the diff") {
    val rows = Seq(("m", ts(0), 1.0), ("m", ts(0), 1.0), // day0 sum 2
      ("m", ts(1), 1.0), ("m", ts(2), 3.0))              // 2→1 down, 1→3 up
    val Seq((_, up, dn, runs, _, _)) = run(rows)
    assert((up, dn, runs) == (1L, 1L, 2L))
  }

  test("real events: five rows, z finite, p in (0,1]") {
    val df = RunsTest.eventTypeRuns(spark, "/root/testdata/sf0.001").cache()
    assert(df.count() == 5)
    assert(df.filter(col("p_value") <= 0.0 || col("p_value") > 1.0).count() == 0)
    assert(df.filter(col("runs") > col("n_up") + col("n_down")).count() == 0)
  }
}
