package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Pareto

/** ABC/Pareto invariants. Value-level oracle equivalence runs through
  * graft.Verify. */
class ParetoSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def abcOf(revs: Seq[(String, Long)], bandWidth: Long)
      : Seq[(String, Long, Double, String)] = {
    import spark.implicits._
    Pareto.abc(revs.toDF("k", "rev"), "k", "rev", bandWidth)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getString(4)))
      .sortBy(_._2)
  }

  test("hand case: 50/30/15/5 -> A A B C with exact boundary handling") {
    val got = abcOf(Seq("a" -> 50L, "b" -> 30L, "c" -> 15L, "d" -> 5L), 10L)
    assert(got.map(t => (t._1, t._2, t._4)) ==
      Seq(("a", 1L, "A"), ("b", 2L, "A"), ("c", 3L, "B"), ("d", 4L, "C")))
    assert(got.map(_._3) == Seq(50.0, 80.0, 95.0, 100.0))
  }

  test("band decomposition is invisible: width 1 vs one-band-fits-all agree") {
    val revs = Seq("p1" -> 503L, "p2" -> 1298L, "p3" -> 87L, "p4" -> 2201L,
      "p5" -> 950L, "p6" -> 1204L, "p7" -> 33L, "p8" -> 1780L,
      "p9" -> 642L, "p10" -> 905L, "p11" -> 1298L, "p12" -> 210L)
    assert(abcOf(revs, 1L) == abcOf(revs, 1000000L))
  }

  test("ties order by key; rank is a permutation; share monotone in rank") {
    val revs = Seq("z" -> 100L, "a" -> 100L, "m" -> 100L, "b" -> 50L)
    val got = abcOf(revs, 7L)
    assert(got.map(_._1) == Seq("a", "m", "z", "b"))
    assert(got.map(_._2) == Seq(1L, 2L, 3L, 4L))
    assert(got.map(_._3) == got.map(_._3).sorted)
  }

  test("q117 over testdata: classes partition and follow rank order") {
    val rows = Pareto.partAbc(spark, dir).collect()
    assert(rows.nonEmpty)
    val byRank = rows.sortBy(_.getLong(2))
    // class letter never decreases along the rank order
    val classes = byRank.map(_.getString(4))
    assert(classes.zip(classes.tail).forall { case (x, y) => x <= y })
    assert(classes.distinct.length >= 2, "expected at least A and C on real data")
    // ranks are 1..n exactly
    assert(byRank.map(_.getLong(2)).toSeq == (1L to rows.length).toSeq)
  }
}
