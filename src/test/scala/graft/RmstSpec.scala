package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Rmst

/** Restricted mean survival time (q165): the no-censoring sample-mean
  * identity, a hand-computed censored case, horizon clipping, the
  * no-event-in-horizon RMST = τ convention, and the registered frame's
  * coherence bounds. Value-level oracle equivalence (identical nano
  * program in DuckDB) runs through graft.Verify. */
class RmstSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def run(obs: Seq[(String, Long, Int)], tau: Long) = {
    import spark.implicits._
    Rmst.rmst(obs.toDF("g", "dur", "event").repartition(5), tau)
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("no censoring: RMST(τ) = mean(min(dur, τ)) exactly (floors only)") {
    val durs = Seq(1L, 3L, 3L, 7L, 12L, 40L)
    val m = run(durs.map(d => ("a", d, 1)), 10L)
    val want = durs.map(d => math.min(d, 10L).toDouble).sum / durs.size
    val got = m("a").getDouble(m("a").fieldIndex("rmst_days"))
    assert(math.abs(got - want) < 1e-5, s"got $got want $want")
  }

  test("hand-computed censored cohort") {
    // (2,evt),(4,cens),(6,evt),(8,cens) τ=10:
    //  S before 2 = 1 → area 2·1 = 2
    //  after t=2: S = 3/4 → gap to 6 = 4 → 3
    //  after t=6: S = 3/4·1/2 = 3/8 → tail (10−6)·0.375 = 1.5
    //  RMST = 6.5
    val m = run(Seq(("a", 2L, 1), ("a", 4L, 0), ("a", 6L, 1), ("a", 8L, 0)), 10L)
    val got = m("a").getDouble(m("a").fieldIndex("rmst_days"))
    assert(math.abs(got - 6.5) < 1e-5, s"got $got")
    assert(m("a").getLong(m("a").fieldIndex("d_horizon")) == 2L)
  }

  test("no event inside the horizon: RMST = τ exactly") {
    val m = run(Seq(("a", 50L, 1), ("a", 60L, 0), ("b", 5L, 1)), 20L)
    assert(m("a").getDouble(m("a").fieldIndex("rmst_days")) == 20.0)
    assert(m("a").getLong(m("a").fieldIndex("d_horizon")) == 0L)
    // group b HAS an in-horizon event and must not read τ
    assert(m("b").getDouble(m("b").fieldIndex("rmst_days")) < 20.0)
  }

  test("events beyond the horizon are invisible: clipping ≡ dropping them") {
    val base = Seq(("a", 2L, 1), ("a", 9L, 1))
    val extra = base ++ Seq(("a", 15L, 1), ("a", 30L, 1))
    val m1 = run(base ++ Seq(("a", 15L, 0), ("a", 30L, 0)), 10L)
    val m2 = run(extra, 10L)
    // same risk sets inside the horizon (post-τ rows only feed n_risk,
    // identically) → identical RMST
    assert(m1("a").getDouble(m1("a").fieldIndex("rmst_days")) ==
      m2("a").getDouble(m2("a").fieldIndex("rmst_days")))
  }

  test("registered q165 at sf0.001: one row per segment, 0 < rmst ≤ τ") {
    val rows = Rmst.segmentRmst(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val v = r.getDouble(r.fieldIndex("rmst_days"))
      assert(v > 0.0 && v <= Rmst.Horizon.toDouble, s"${r.getString(0)}: $v")
      assert(r.getLong(r.fieldIndex("n_total")) > 0)
    }
  }
}
