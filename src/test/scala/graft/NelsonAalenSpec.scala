package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Survival

/** Nelson–Aalen cumulative hazard (q178): a hand-computed censored
  * cohort (steps, variance, Fleming–Harrington survival), group
  * independence, and the FH ≥ KM inequality. Value-level oracle
  * equivalence runs through graft.Verify. */
class NelsonAalenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def na(rows: Seq[(String, Long, Int)]) = {
    import spark.implicits._
    Survival.nelsonAalen(rows.toDF("g", "dur", "event").repartition(3))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
  }

  // 5 subjects: events at t=1 and t=3, censored at t=2, 4, 5
  private val cohort = Seq(
    ("A", 1L, 1), ("A", 2L, 0), ("A", 3L, 1), ("A", 4L, 0), ("A", 5L, 0))

  test("hand case: H(t) = Σ d/n on the nano grid, SE and exp(−H)") {
    val m = na(cohort)
    assert(m.keySet == Set(("A", 1L), ("A", 3L))) // event times only
    val t1 = m(("A", 1L))
    assert(t1.getLong(t1.fieldIndex("n_risk")) == 5L)
    assert(t1.getDouble(t1.fieldIndex("cum_hazard")) == 0.2)
    // v = 1/25 exactly on the 1e12 grid
    assert(t1.getDouble(t1.fieldIndex("se_hazard")) == 0.2)
    val t3 = m(("A", 3L))
    assert(t3.getLong(t3.fieldIndex("n_risk")) == 3L)
    // 0.2e9 + floor(1e9/3 + 0.5) = 533333333 nano-nats
    assert(t3.getDouble(t3.fieldIndex("cum_hazard")) == 0.533333)
    // v = 1/25 + 1/9 on the 1e12 grid = 0.151111111111
    val seExp = math.sqrt((40000000000L + 111111111111L).toDouble / 1e12)
    assert(math.abs(t3.getDouble(t3.fieldIndex("se_hazard")) - seExp) < 2e-6)
    val fh = t3.getDouble(t3.fieldIndex("fh_survival"))
    assert(math.abs(fh - math.exp(-0.533333333)) < 2e-6, s"fh=$fh")
  }

  test("groups are independent: a second cohort leaves A unchanged") {
    val solo = na(cohort)
    val joint = na(cohort ++ Seq(("B", 1L, 1), ("B", 9L, 1), ("B", 9L, 0)))
    assert(joint(("A", 3L)).getDouble(4) == solo(("A", 3L)).getDouble(4))
    // B: t=1 d=1 n=3 → 1/3; t=9 d=1 n=2 → +1/2 = 0.833333
    assert(joint(("B", 9L)).getDouble(joint(("B", 9L))
      .fieldIndex("cum_hazard")) == 0.833333)
  }

  test("FH survival dominates KM at every event time (d < n steps)") {
    import spark.implicits._
    val obs = (1 to 40).map(i =>
      ("A", (i % 7 + 1).toLong, if (i % 3 == 0) 0 else 1))
    val fh = Survival.nelsonAalen(obs.toDF("g", "dur", "event"))
      .select("t_days", "fh_survival").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val km = Survival.kaplanMeier(obs.toDF("g", "dur", "event"))
      .select("t_days", "survival").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fh.keySet == km.keySet && fh.nonEmpty)
    fh.foreach { case (t, s) => assert(s >= km(t) - 1e-9, s"t=$t") }
  }
}
