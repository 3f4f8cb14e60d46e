package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Monitor

/** Monitoring-operator invariants. Value-level oracle equivalence runs
  * through graft.Verify. */
class MonitorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("profile drift: planted null injection flags exactly the degraded column") {
    import spark.implicits._
    val old = (1L to 100L).map(i => (i, s"v${i % 7}", s"w$i")).toDF("k", "a", "b")
    val neu = (1L to 100L)
      .map(i => (i, if (i % 4 == 0) null else s"v${i % 7}", s"w$i"))
      .toDF("k", "a", "b")
    val got = Monitor.profileDrift(old, neu, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getInt(5))).toMap
    assert(got("a") == ((0L, 250000L, 1)))  // 25% nulls appeared -> flagged
    assert(got("b") == ((0L, 0L, 0)))       // untouched -> quiet
  }

  test("q86 over testdata: exactly the two planted degradations flag as expected") {
    val got = Monitor.customerDrift(spark, dir).collect()
      .map(r => r.getString(0) -> r.getInt(5)).toMap
    assert(got == Map("c_mktsegment" -> 1, "c_acctbal" -> 1))
  }

  test("k-anonymity: bands partition the table; small groups surface") {
    import spark.implicits._
    // 1 singleton, one pair, one group of 7 (clamped into the k band)
    val df = (Seq(("x", 1)) ++ Seq.fill(2)(("y", 2)) ++ Seq.fill(7)(("z", 3)))
      .toDF("q1", "q2")
    val got = Monitor.kAnonymity(df, Seq("q1", "q2"), k = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> ((1L, 1L)), 2L -> ((1L, 2L)), 5L -> ((1L, 7L))))
    // rows always conserved across bands
    assert(got.values.map(_._2).sum == df.count())
  }

  test("q87/q88 over testdata: conservation identities hold") {
    val ka = Monitor.customerKAnonymity(spark, dir)
    assert(ka.agg(sum("n_rows")).head.getLong(0) ==
      Tables.customer(spark, dir).count())
    val sk = Monitor.lineitemKeySkew(spark, dir).head
    val li = Tables.lineitem(spark, dir)
    assert(sk.getLong(0) == li.count())
    assert(sk.getLong(1) == li.select("l_orderkey").distinct().count())
    assert(sk.getLong(3) >= 1L && sk.getLong(3) <= 1000000L) // top share sane
  }

  test("q107 benford: exact shares on planted digits, spine covers gaps, ≤0 excluded") {
    import spark.implicits._
    // 3 values starting with digit 1, 1 with digit 5; zero/negative noise
    val df = Seq(1.0, 12.34, 0.19, 5.0, 0.0, -3.0).toDF("v")
    val out = Monitor.benfordAudit(df, "v").collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.size == 9, "all 9 digits present via the spine")
    assert(out(1).getLong(1) == 3L && out(5).getLong(1) == 1L)
    assert(out(1).getDouble(out(1).fieldIndex("obs_share")) == 0.75)
    assert(out(2).getLong(1) == 0L, "zero-count digit surfaces with n_obs = 0")
    assert(out(2).getDouble(out(2).fieldIndex("obs_share")) == 0.0)
    // dev_abs = |share − benford| exactly at the rounded grid
    assert(out(1).getDouble(out(1).fieldIndex("dev_abs")) == 0.44897)
    assert(out(9).getDouble(out(9).fieldIndex("dev_abs")) == 0.045757)
    // expected shares are the published constants and sum to exactly 1
    val s = out.values.map(r => BigDecimal(
      r.getDouble(r.fieldIndex("benford_share")).toString)).sum
    assert(s == BigDecimal("1.000000"))
  }

  test("q108 gini: equality → 0, brute-force parity with ties, ≤0 excluded") {
    import spark.implicits._
    // all-equal group: G = 0 exactly
    val eq = Monitor.giniByGroup(
      Seq.fill(10)(("e", 7.0)).toDF("g", "v"), "g", "v").head()
    assert(eq.getDouble(eq.fieldIndex("gini")) == 0.0)
    assert(eq.getLong(eq.fieldIndex("n_rows")) == 10L)
    // brute-force parity on a tied, skewed sample (negatives dropped)
    val vals = Seq(1.0, 1.0, 2.0, 2.0, 2.0, 5.0, 10.0, 50.0)
    val df = (vals.map(("s", _)) ++ Seq(("s", -3.0), ("s", 0.0))).toDF("g", "v")
    val out = Monitor.giniByGroup(df, "g", "v").head()
    assert(out.getLong(out.fieldIndex("n_rows")) == vals.size.toLong)
    val n = vals.size
    val brute = (for { i <- vals.indices; j <- vals.indices }
      yield math.abs(vals(i) - vals(j))).sum / (2.0 * n * vals.sum)
    assert(math.abs(out.getDouble(out.fieldIndex("gini")) - brute) < 2e-6,
      s"${out.getDouble(out.fieldIndex("gini"))} vs brute $brute")
    // total concentration limit: one giant holder → G → (n−1)/n
    val conc = Seq.fill(9)(("c", 0.01)) :+ (("c", 10000.0))
    val g = Monitor.giniByGroup(conc.toDF("g", "v"), "g", "v")
      .head().getDouble(3)
    assert(g > 0.89 && g < 0.9, s"near-total concentration should give ~0.9, got $g")
  }

  test("q112 hhi: equal members, monopoly, and group independence") {
    import spark.implicits._
    // n equal members: hhi = 1/n, equiv_n = n, top_share = 1/n
    val eq = (1 to 8).map(i => ("g", s"m$i", 25.0)).toDF("g", "m", "v")
    val r = Monitor.hhiByGroup(eq, "g", "m", "v").head()
    assert(r.getLong(r.fieldIndex("n_members")) == 8L)
    assert(r.getDouble(r.fieldIndex("hhi")) == 0.125)
    assert(r.getDouble(r.fieldIndex("equiv_n")) == 8.0)
    assert(r.getDouble(r.fieldIndex("top_share")) == 0.125)
    // monopoly: hhi = 1 regardless of row multiplicity
    val mono = Seq(("g", "only", 10.0), ("g", "only", 30.0)).toDF("g", "m", "v")
    val m = Monitor.hhiByGroup(mono, "g", "m", "v").head()
    assert(m.getDouble(m.fieldIndex("hhi")) == 1.0 &&
      m.getDouble(m.fieldIndex("equiv_n")) == 1.0)
    // groups do not contaminate each other; nonpositive rows drop
    val two = Seq(("a", "x", 60.0), ("a", "y", 40.0), ("a", "z", -5.0),
      ("b", "x", 1.0)).toDF("g", "m", "v")
    val got = Monitor.hhiByGroup(two, "g", "m", "v").collect()
      .map(x => x.getString(0) -> x.getDouble(x.fieldIndex("hhi"))).toMap
    assert(got("a") == 0.52 && got("b") == 1.0) // 0.6² + 0.4²
  }

  test("q107 benford: organic-looking multiplicative data tracks the law") {
    import spark.implicits._
    // deterministic multiplicative cascade: 1.05^i spans 4+ decades —
    // the canonical Benford-convergent sequence
    val df = (1 to 400).map(i => math.pow(1.05, i)).toDF("v")
    val out = Monitor.benfordAudit(df, "v").collect()
    val maxDev = out.map(r => r.getDouble(r.fieldIndex("dev_abs"))).max
    assert(maxDev < 0.03, s"1.05^i should track Benford, max dev $maxDev")
  }
}
