package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Logrank

/** Two-group log-rank (q159): textbook hand case with censoring (the
  * hypergeometric variance included), directional planted-effect and
  * null checks, and the degenerate no-event contract. Value-level
  * oracle equivalence (identical integer program in DuckDB) runs
  * through graft.Verify. */
class LogrankSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def lr(obs: Seq[(Int, Long, Int)]) = {
    import spark.implicits._
    Logrank.logrank(obs.toDF("arm", "dur", "event").repartition(7)).collect()
  }

  test("textbook censored cohort: O1, micro-floored E1 and V, z") {
    // arm1: event@1, censored@2, event@4; arm2: censored@1, event@3,
    // event@4, censored@5. Risk table by hand:
    //   t=1: n1=3 n2=4 n=7 d=1 (d1=1)   t=2: d=0 (skipped)
    //   t=3: n1=1 n2=3 n=4 d=1 (d1=0)   t=4: n1=1 n2=2 n=3 d=2 (d1=1)
    //   t=5: n=1 (skipped)
    // O1 = 2
    // e1_micro = 3000000/7 + 1000000/4 + 2000000/3 (floored)
    //          = 428571 + 250000 + 666666 = 1345237
    // a(t)=floor(1e6*n1*n2/n^2): 244897, 187500, 222222; with
    // d(n-d)/(n-1) factors 1, 1, 1 → v_micro = 654619
    val rows = lr(Seq((1, 1L, 1), (1, 2L, 0), (1, 4L, 1),
      (0, 1L, 0), (0, 3L, 1), (0, 4L, 1), (0, 5L, 0)))
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(r.fieldIndex("n_arm1")) == 3L)
    assert(r.getLong(r.fieldIndex("n_arm2")) == 4L)
    assert(r.getLong(r.fieldIndex("o1")) == 2L)
    assert(r.getDouble(r.fieldIndex("e1")) == 1.345237)
    assert(r.getDouble(r.fieldIndex("v")) == 0.654619)
    val z = (2.0 - 1.345237) / math.sqrt(0.654619)
    assert(math.abs(r.getDouble(r.fieldIndex("z_lr")) - z) < 5e-5)
    assert(math.abs(r.getDouble(r.fieldIndex("chi2")) -
      r.getDouble(r.fieldIndex("z_lr")) * r.getDouble(r.fieldIndex("z_lr"))) < 1e-6)
  }

  test("planted effect: the early-dying arm has O1 > E1, small p") {
    // arm1 all dies by t<=5, arm2 survives to t>=20 (events there):
    // every early risk set is arm1-heavy in deaths
    val obs = (1 to 20).map(i => (1, i.toLong % 5 + 1, 1)) ++
      (1 to 20).map(i => (0, 20L + i % 5, 1))
    val r = lr(obs).head
    val o1 = r.getLong(r.fieldIndex("o1")).toDouble
    assert(o1 > r.getDouble(r.fieldIndex("e1")))
    assert(r.getDouble(r.fieldIndex("z_lr")) > 3.0)
    assert(r.getDouble(r.fieldIndex("p_value")) < 0.01)
  }

  test("null case: identical arms give z = 0 exactly") {
    // mirror-image arms: at every event time n1 = n2 and d1 = d2, so
    // the per-step integer terms cancel pairwise in O1 - E1 up to the
    // micro floor (e1_t = (1e6*d*n1) div n with n = 2*n1 — exact when
    // d even; the cohort uses d1 = d2 = 1 per time, d = 2, so
    // e1_t = 1e6*2*n1 div 2*n1 = exactly 1e6 per step)
    val obs = (1 to 10).flatMap(t => Seq((1, t.toLong, 1), (0, t.toLong, 1)))
    val r = lr(obs).head
    assert(r.getLong(r.fieldIndex("o1")) == 10L)
    assert(r.getDouble(r.fieldIndex("e1")) == 10.0)
    assert(r.getDouble(r.fieldIndex("z_lr")) == 0.0)
    assert(r.getDouble(r.fieldIndex("p_value")) == 1.0)
  }

  test("degenerate: no events at all → empty result (documented)") {
    val rows = lr(Seq((1, 3L, 0), (0, 5L, 0), (0, 7L, 0)))
    assert(rows.isEmpty)
  }

  test("logrankBy: planted effect in ONE stratum only, null in the other") {
    import spark.implicits._
    // stratum A = the planted-effect cohort (arm1 dies early), stratum
    // B = the mirror-image null cohort; the grouped test must localize
    // the signal to A and report z = 0 for B — a pooled test can't.
    val eff = (1 to 20).map(i => ("A", 1, i.toLong % 5 + 1, 1)) ++
      (1 to 20).map(i => ("A", 0, 20L + i % 5, 1))
    val nul = (1 to 10).flatMap(t =>
      Seq(("B", 1, t.toLong, 1), ("B", 0, t.toLong, 1)))
    val df = (eff ++ nul).toDF("seg", "arm", "dur", "event").repartition(7)
    val rows = Logrank.logrankBy(df, "seg").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("A", "B"))
    assert(rows("A").getDouble(rows("A").fieldIndex("z_lr")) > 3.0)
    assert(rows("B").getDouble(rows("B").fieldIndex("z_lr")) == 0.0)
    // each stratum must equal its own standalone two-group test
    val aAlone = Logrank.logrank(
      eff.map { case (_, a, d, e) => (a, d, e) }.toDF("arm", "dur", "event"))
      .collect().head
    assert(aAlone.getDouble(aAlone.fieldIndex("z_lr")) ==
      rows("A").getDouble(rows("A").fieldIndex("z_lr")))
  }

  test("registered q161 at sf0.001: one finite row per populated region") {
    val rows = Logrank.regionSegmentLogrank(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_arm1")) >= 0)
      if (!r.isNullAt(r.fieldIndex("p_value"))) { // NULL iff V = 0 (degenerate stratum)
        val p = r.getDouble(r.fieldIndex("p_value"))
        assert(p >= 0.0 && p <= 1.0)
      }
    }
  }

  test("registered q159 runs and is a single finite row at sf0.001") {
    val r = Logrank.segmentLogrank(spark, "/root/testdata/sf0.001").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(row.fieldIndex("n_arm1")) > 0)
    assert(!row.isNullAt(row.fieldIndex("z_lr")))
    val p = row.getDouble(row.fieldIndex("p_value"))
    assert(p >= 0.0 && p <= 1.0)
  }
}
