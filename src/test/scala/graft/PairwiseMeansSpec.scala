package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.PairwiseMeans

class PairwiseMeansSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def run(rows: Seq[(String, Double)]) =
    PairwiseMeans.pairwiseMeans(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => (r.getString(0),
        r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1).toSeq

  test("hand case: one separated group flags only its own pairs") {
    // a and b share the same distribution; c shifted to 100 — only
    // a|c and b|c stand out
    val rows =
      (1 to 20).map(i => ("a", 10.0 + (i % 3) * 0.1)) ++
      (1 to 20).map(i => ("b", 10.0 + (i % 3) * 0.1)) ++
      (1 to 20).map(i => ("c", 100.0 + (i % 3) * 0.1))
    val got = run(rows)
    assert(got.map(_._1) == Seq("a|b", "a|c", "b|c"))
    val byPair = got.map(t => t._1 -> t).toMap
    assert(math.abs(byPair("a|b")._2) < 10.0)
    assert(byPair("a|c")._2 < -100.0) // enormous separation
    assert(byPair("a|c")._5 < 1e-5 && byPair("b|c")._5 < 1e-5)
    assert(byPair("a|b")._5 > 0.01) // BH keeps the null pair unflagged
  }

  test("pair family excludes degenerate singleton groups") {
    val rows = Seq(("x", 1.0), ("y", 2.0), ("y", 3.0), ("z", 4.0), ("z", 5.0))
    val got = run(rows)
    // x has n=1 → every x pair NULL z → excluded; only y|z remains
    assert(got.map(_._1) == Seq("y|z"))
    assert(got.head._4 == 1L) // rank within a 1-test family
  }

  test("identical groups: z = 0, p = 1, BH keeps q at 1") {
    val rows = (1 to 10).flatMap(i => Seq(("p", i.toDouble), ("q", i.toDouble)))
    val got = run(rows)
    assert(got.head._2 == 0.0)
    assert(math.abs(got.head._3 - 1.0) < 1e-6)
    assert(got.head._5 == 1.0)
  }

  test("real customer A/A-style family: 300 pairs, q-values not collapsed") {
    val df = PairwiseMeans.nationBalancePairs(spark, "/root/testdata/sf0.001")
      .cache()
    assert(df.count() == 300) // C(25,2)
    assert(df.filter(col("p_bh") < 0.0 || col("p_bh") > 1.0).count() == 0)
    // balances are uniform across nations: BH should clear most pairs
    assert(df.filter(col("p_bh") > 0.2).count() > 200)
    assert(df.agg(max("rank_p")).collect().head.getLong(0) == 300L)
  }
}
