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
}
