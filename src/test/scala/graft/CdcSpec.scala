package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Cdc

/** CDC-application semantics on planted feeds. Value-level oracle
  * equivalence runs through graft.Verify. */
class CdcSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def apply(base: Seq[(Long, String, Double)],
      feed: Seq[(Long, Long, String, String, Double)]): Map[Long, (String, Double)] = {
    import spark.implicits._
    Cdc.applyChanges(
      base.toDF("k", "seg", "bal"),
      feed.toDF("k", "lsn", "op", "seg", "bal"),
      "k", Seq("seg", "bal"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
  }

  test("latest lsn wins per key across I/U/D; untouched keys pass through") {
    val base = Seq((1L, "A", 1.0), (2L, "B", 2.0), (3L, "C", 3.0), (4L, "D", 4.0))
    val feed = Seq(
      (1L, 1L, "U", "A1", 10.0), (1L, 2L, "U", "A2", 20.0), // latest U wins
      (2L, 1L, "U", "B1", 5.0), (2L, 2L, "D", "", 0.0),     // delete after update
      (5L, 1L, "I", "NEW", 50.0),                           // fresh insert
      (4L, 2L, "D", "", 0.0), (4L, 3L, "U", "D9", 9.0))     // resurrect after delete
    val got = apply(base, feed)
    assert(got == Map(
      1L -> (("A2", 20.0)),
      3L -> (("C", 3.0)),
      4L -> (("D9", 9.0)),
      5L -> (("NEW", 50.0))))
  }

  test("empty feed is identity; delete of a missing key is a no-op") {
    val base = Seq((1L, "A", 1.0))
    assert(apply(base, Seq.empty) == Map(1L -> (("A", 1.0))))
    assert(apply(base, Seq((9L, 1L, "D", "", 0.0))) == Map(1L -> (("A", 1.0))))
  }

  test("q84 over testdata: snapshot algebra holds (inserts - deletes)") {
    val dir = "/root/testdata/sf0.001"
    val base = Tables.customer(spark, dir)
    val nBase = base.count()
    val nIns = base.filter(expr("c_custkey % 10 = 0")).count()
    val nDel = base.filter(expr("c_custkey % 6 = 0")).count()
    val out = Cdc.customerApply(spark, dir).cache()
    assert(out.count() == nBase + nIns - nDel)
    // wave-2 keys (not deleted) carry WAVE2, never WAVE1
    assert(out.filter(expr("c_custkey % 8 = 0 AND c_custkey % 6 <> 0" +
      " AND c_custkey < 2000000000 AND c_mktsegment <> 'WAVE2'")).count() == 0)
    // inserted keys all present
    assert(out.filter(expr("c_custkey >= 2000000000")).count() == nIns)
  }
}
