package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Decompose

/** Classical weekly decomposition (q239): exact recovery of a planted
  * level+season+trend construction, Σseasonal = 0 centering, edge-day
  * exclusion, trend-proofness (a linear drift contaminates q127's raw
  * dow means but NOT the detrended seasonal), and the registered query
  * at sf0.001. Value-level oracle equivalence runs through
  * graft.Verify. */
class DecomposeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  /** Day cells t = 0..6·7−1 (9 full weeks), x = level + s(dow) in
    * cents; dow convention: (t+4)%7. */
  private def planted(level: Long, s: Int => Long, weeks: Int = 9,
      slope: Long = 0L) = {
    import spark.implicits._
    (0 until weeks * 7).map { t =>
      ("g1", t.toLong, level + s((t + 4) % 7) + slope * t)
    }.toDF("g", "t", "x")
  }

  test("pure level+season: seasonal recovered exactly, rms 0, level exact") {
    val sPlan: Int => Long = d => Seq(0L, 700L, -700L, 1400L, -1400L, 2100L, -2100L)(d)
    val r = Decompose.weeklyDecompose(planted(100000L, sPlan)).collect()
    assert(r.length == 1)
    val m = r.head
    def f(c: String) = m.getDouble(m.fieldIndex(c))
    // planted seasonal sums to 0 ⇒ centered seasonal = planted exactly
    (0 to 6).foreach { d =>
      assert(math.abs(f(s"s$d") - sPlan(d) / 100.0) < 1e-9,
        s"s$d = ${f(s"s$d")} want ${sPlan(d) / 100.0}")
    }
    assert(f("remainder_rms") == 0.0)
    // trend-defined days drop 3 at each edge: 63 − 6 = 57
    assert(m.getLong(m.fieldIndex("n_days")) == 57L)
    // level = mean of x over those days (mean of a full-week-balanced
    // span of the pure cycle = level ± the 6 clipped days' imbalance)
    assert(math.abs(f("level") - 1000.0) < 25.0)
  }

  test("centering: the recovered seasonal sums to zero even when the plant doesn't") {
    val sPlan: Int => Long = d => 300L * d // Σ ≠ 0: mean absorbed into level
    val m = Decompose.weeklyDecompose(planted(50000L, sPlan)).collect().head
    val total = (0 to 6).map(d => m.getDouble(m.fieldIndex(s"s$d"))).sum
    assert(math.abs(total) < 1e-6, s"Σ seasonal = $total")
    // shape preserved: s(d) − mean(s) = 300(d − 3) cents
    (0 to 6).foreach { d =>
      assert(math.abs(m.getDouble(m.fieldIndex(s"s$d")) - 3.0 * (d - 3)) < 1e-9)
    }
  }

  test("trend-proof: a linear drift leaves the seasonal estimate intact") {
    // +40 cents/day drift: raw dow means (q127's object) shift by up
    // to 40·(weeks·7)/2 ≈ 12.6 dollars; the MA-detrended seasonal
    // must stay at the planted cycle (a centered MA passes a linear
    // ramp through exactly, so detrended = season + 0)
    val sPlan: Int => Long = d => Seq(0L, 700L, -700L, 1400L, -1400L, 2100L, -2100L)(d)
    val m = Decompose.weeklyDecompose(planted(100000L, sPlan, slope = 40L))
      .collect().head
    (0 to 6).foreach { d =>
      assert(math.abs(m.getDouble(m.fieldIndex(s"s$d")) - sPlan(d) / 100.0) < 0.02,
        s"s$d drifted: ${m.getDouble(m.fieldIndex(s"s$d"))}")
    }
    assert(m.getDouble(m.fieldIndex("remainder_rms")) < 0.02)
  }

  test("noise lands in the remainder, not the seasonal") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val noise = (0 until 63).map(_ => rnd.nextInt(2001) - 1000L)
    val df = (0 until 63).map { t =>
      ("g1", t.toLong, 100000L + noise(t))
    }.toDF("g", "t", "x")
    val m = Decompose.weeklyDecompose(df).collect().head
    // white noise: seasonal small, rms on the noise scale (σ≈5.77$)
    val rms = m.getDouble(m.fieldIndex("remainder_rms"))
    assert(rms > 1.0 && rms < 10.0, s"rms $rms")
  }

  test("groups decompose independently") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val sPlan: Int => Long = d => Seq(0L, 700L, -700L, 1400L, -1400L, 2100L, -2100L)(d)
    val a = planted(100000L, sPlan)
    val b = planted(200000L, d => -sPlan(d)).withColumn("g", lit("g2"))
    val both = Decompose.weeklyDecompose(a.unionByName(b)).collect()
      .map(r => r.getString(0) -> r).toMap
    val alone = Decompose.weeklyDecompose(a).collect().head
    (0 to 6).foreach { d =>
      assert(both("g1").getDouble(both("g1").fieldIndex(s"s$d")) ==
        alone.getDouble(alone.fieldIndex(s"s$d")))
      assert(math.abs(both("g2").getDouble(both("g2").fieldIndex(s"s$d")) +
        alone.getDouble(alone.fieldIndex(s"s$d"))) < 1e-9)
    }
  }

  test("registered q239 at sf0.001: one row per priority, finite fields") {
    val rows = Decompose.dailyRevenueDecompose(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_days")) > 0)
      assert(r.getDouble(r.fieldIndex("level")) > 0.0)
      val total = (0 to 6).map(d => r.getDouble(r.fieldIndex(s"s$d"))).sum
      assert(math.abs(total) < 0.01, s"Σ seasonal $total")
      assert(r.getDouble(r.fieldIndex("remainder_rms")) >= 0.0)
    }
  }
}
