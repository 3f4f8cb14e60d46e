package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Changepoint

/** CUSUM invariants: the window form must equal the textbook clamped
  * recursion exactly, and alarms must fire after a planted shift and
  * never on the in-control prefix. Value-level oracle equivalence runs
  * through graft.Verify. */
class ChangepointSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def ts(i: Int) = new Timestamp(86400000L + i * 60000L)

  private def run(vals: Seq[Double], target: Long, k: Long, h: Long) = {
    import spark.implicits._
    val df = vals.zipWithIndex.map { case (v, i) => ("g", ts(i), i.toLong, v) }
      .toDF("g", "ts", "id", "v")
    Changepoint.cusum(df, "g", "ts", "id", "v", target, k, h)
      .orderBy("tie").collect()
  }

  test("window form equals the literal clamped recursion on a noisy series") {
    // deterministic pseudo-noise around 50, then a +20 shift
    val vals = (0 until 60).map(i => 50.0 + ((i * 37) % 11) - 5) ++
      (0 until 40).map(i => 70.0 + ((i * 23) % 7) - 3)
    val rows = run(vals, 5000L, 500L, 20000L)
    var su = 0L; var sd = 0L
    vals.zip(rows).foreach { case (v, r) =>
      val xc = math.floor(v * 100).toLong
      su = math.max(0L, su + (xc - 5000L - 500L))
      sd = math.max(0L, sd + (5000L - 500L - xc))
      assert(r.getLong(r.fieldIndex("s_up")) == su, s"s_up diverges at $v")
      assert(r.getLong(r.fieldIndex("s_dn")) == sd, s"s_dn diverges at $v")
    }
  }

  test("planted upward shift alarms after the changepoint, never before") {
    val inControl = Seq.fill(50)(50.0)
    val shifted = Seq.fill(30)(58.0) // +8 vs allowance 5: drift 3/step
    val rows = run(inControl ++ shifted, 5000L, 500L, 5000L)
    val alarms = rows.zipWithIndex
      .filter { case (r, _) => r.getBoolean(r.fieldIndex("alarm")) }
    assert(alarms.nonEmpty, "sustained +8 shift must eventually alarm")
    assert(alarms.forall(_._2 >= 50), "no alarm during the in-control prefix")
    // detection delay ≈ h / ((δ−k)·100 cents) = 5000/300 ≈ 17 steps
    val first = alarms.head._2 - 50
    assert(first >= 10 && first <= 25, s"delay $first outside the ARL window")
    assert(alarms.forall { case (r, _) =>
      r.getString(r.fieldIndex("dir")) == "up" })
  }

  test("in-control series never alarms; downward shift fires the mirror side") {
    val flat = (0 until 100).map(i => 50.0 + ((i * 13) % 9) - 4)
    assert(run(flat, 5000L, 500L, 20000L).forall(r => !r.getBoolean(r.fieldIndex("alarm"))))
    val down = Seq.fill(40)(50.0) ++ Seq.fill(40)(41.0)
    val alarms = run(down, 5000L, 500L, 5000L).filter(r => r.getBoolean(r.fieldIndex("alarm")))
    assert(alarms.nonEmpty && alarms.forall(r => r.getString(r.fieldIndex("dir")) == "down"))
  }

  test("q105 summary shape on testdata: counts and extrema consistent") {
    val out = Changepoint.eventsCusum(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_up")) +
        r.getLong(r.fieldIndex("n_down")) <= 2 * r.getLong(r.fieldIndex("n_rows")))
      assert(r.getDouble(r.fieldIndex("max_s_up")) >= 0.0)
      assert(r.getDouble(r.fieldIndex("max_s_dn")) >= 0.0)
      // an alarm count implies its extremum cleared the h threshold
      if (r.getLong(r.fieldIndex("n_up")) > 0)
        assert(r.getDouble(r.fieldIndex("max_s_up")) > Changepoint.H / 100.0)
    }
  }
}
