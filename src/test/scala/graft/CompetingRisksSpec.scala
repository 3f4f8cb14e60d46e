package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.CompetingRisks

/** Aalen–Johansen cumulative incidence (q163): textbook hand case with
  * both causes + censoring (nano increments computed by hand), the
  * single-cause 1−KM identity, the overstatement theorem vs
  * cause-specific KM, and monotonicity/additivity on the registered
  * frame. Value-level oracle equivalence (identical integer program in
  * DuckDB) runs through graft.Verify. */
class CompetingRisksSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def cif(obs: Seq[(Long, Int)]) = {
    import spark.implicits._
    CompetingRisks.cumulativeIncidence(
      obs.toDF("dur", "event").repartition(5))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("textbook two-cause censored cohort: hand-computed nano program") {
    // (1,c1),(1,c2),(2,cens),(3,c2),(4,c1),(5,cens), n=6:
    //  t=1: n=6 d1=1 d2=1, s_prev=1e9, inc=166666666 each;
    //       term=ln(4/6)→-405465108
    //  t=3: n=3 d2=1, s_prev=floor(exp(-.405465108)e9+.5)=666666667,
    //       inc2=222222222 → cif2=388888888
    //  t=4: n=2 d1=1, s_prev=floor(exp(-.810930216)e9+.5)=444444445,
    //       inc1=222222222 → cif1=388888888; surv=(2/3)²·½≈0.222222
    val m = cif(Seq((1L, 1), (1L, 2), (2L, 0), (3L, 2), (4L, 1), (5L, 0)))
    assert(m.keySet == Set(1L, 3L, 4L))
    def d(r: org.apache.spark.sql.Row, c: String) = r.getDouble(r.fieldIndex(c))
    assert(d(m(1L), "cif_1") == 0.166667 && d(m(1L), "cif_2") == 0.166667)
    assert(d(m(1L), "survival") == 0.666667)
    assert(d(m(3L), "cif_1") == 0.166667 && d(m(3L), "cif_2") == 0.388889)
    assert(d(m(3L), "survival") == 0.444444)
    assert(d(m(4L), "cif_1") == 0.388889 && d(m(4L), "cif_2") == 0.388889)
    assert(d(m(4L), "survival") == 0.222222)
    assert(m(4L).getLong(m(4L).fieldIndex("n_risk")) == 2L)
  }

  test("single cause, no censoring: cif_1 = 1 − survival at every step") {
    val m = cif((1L to 20L).map(t => (t, 1)))
    m.values.foreach { r =>
      val s = r.getDouble(r.fieldIndex("survival"))
      val c1 = r.getDouble(r.fieldIndex("cif_1"))
      assert(math.abs(s + c1 - 1.0) < 1e-5, s"t=${r.getLong(0)}")
      assert(r.getDouble(r.fieldIndex("cif_2")) == 0.0)
    }
  }

  test("AJ does NOT overstate: cif_1 < 1 − (cause-specific KM treating cause 2 as censoring)") {
    // 5 cause-2 exits at t=1, then all cause-1: the naive cause-1 KM
    // (competing exits censored) reaches S=0 → incidence 1.0; the AJ
    // cif_1 correctly tops out at the probability of EVER exiting by
    // cause 1 = 0.5 (0.3 at t=2 + 0.2 at t=3)
    val obs = Seq.fill(5)((1L, 2)) ++ Seq.fill(3)((2L, 1)) ++ Seq.fill(2)((3L, 1))
    val m = cif(obs)
    val last = m(3L)
    assert(last.getDouble(last.fieldIndex("cif_1")) == 0.5)
    assert(last.getDouble(last.fieldIndex("cif_2")) == 0.5)
    assert(last.getDouble(last.fieldIndex("survival")) == 0.0)
  }

  test("registered q163 at sf0.001: monotone CIFs, additivity bound") {
    val rows = CompetingRisks.churnIncidence(spark, "/root/testdata/sf0.001")
      .orderBy("t_days").collect()
    assert(rows.nonEmpty)
    var (p1, p2) = (0.0, 0.0)
    rows.foreach { r =>
      val c1 = r.getDouble(r.fieldIndex("cif_1"))
      val c2 = r.getDouble(r.fieldIndex("cif_2"))
      val s = r.getDouble(r.fieldIndex("survival"))
      assert(c1 >= p1 - 1e-9 && c2 >= p2 - 1e-9, "CIFs must be nondecreasing")
      assert(c1 + c2 + s <= 1.0 + 1e-4, "incidence + survival ≤ 1")
      assert(c1 + c2 + s >= 1.0 - 1e-3,
        "event-time rows partition the probability mass (floors only)")
      p1 = c1; p2 = c2
    }
    assert(rows.exists(_.getLong(1) > 0))
  }
}
