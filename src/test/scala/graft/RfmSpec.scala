package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Rfm

/** RFM scoring invariants. Value-level oracle equivalence runs through
  * graft.Verify. */
class RfmSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def score(obs: Seq[(Long, Long, Long, Long)]) = {
    import spark.implicits._
    Rfm.score(obs.toDF("k", "rec", "freq", "mon_c")).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))
      .toMap
  }

  test("distinct deciles land in exact quintiles; recency inverts direction") {
    // 10 customers: rec 0..9, freq 1..10, monetary 100..1000 dollars
    val obs = (0L until 10L).map(i =>
      (i, i, i + 1, (i + 1) * 100L * 100L))
    val got = score(obs)
    // strictly-below counts 0,1->1  2,3->2  4,5->3  6,7->4  8,9->5
    val fm = Seq(1, 1, 2, 2, 3, 3, 4, 4, 5, 5)
    (0 until 10).foreach { i =>
      val (r, f, m, _) = got(i.toLong)
      assert(f == fm(i) && m == fm(i), s"cust $i: f=$f m=$m want ${fm(i)}")
      // recency 0 is BEST -> 5; recency 9 worst -> 1
      assert(r == fm(9 - i), s"cust $i: r=$r want ${fm(9 - i)}")
    }
  }

  test("ties share the conservative lowest band") {
    val got = score((1L to 6L).map(k => (k, 3L, 4L, 50000L)))
    got.values.foreach { case (r, f, m, seg) =>
      assert((r, f, m) == ((1, 1, 1)))
      assert(seg == "hibernating")
    }
  }

  test("segment rules fire in precedence order") {
    // 10 customers again: i=0 has best recency+freq+monetary
    val got = score((0L until 10L).map(i =>
      (i, i, 10L - i, (10L - i) * 100L * 100L)))
    assert(got(0L) == ((5, 5, 5, "champions")))
    assert(got(9L)._4 == "hibernating") // worst recency, 1 order
  }

  test("q114 over testdata: scores bounded, segments total, f monotone in freq") {
    val rows = Rfm.customerRfm(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(4, 5, 6).foreach(i => assert(r.getInt(i) >= 1 && r.getInt(i) <= 5))
      assert(r.getString(7) != null)
    }
    // same frequency -> same f_score; higher frequency -> >= f_score
    val byFreq = rows.map(r => r.getLong(2) -> r.getInt(5)).distinct
      .sortBy(_._1)
    assert(byFreq.groupBy(_._1).values.forall(_.length == 1),
      "equal frequency must map to one score")
    byFreq.sliding(2).foreach {
      case Array((_, a), (_, b)) => assert(a <= b, "f_score must be monotone")
      case _ =>
    }
  }
}
