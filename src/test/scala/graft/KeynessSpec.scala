package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import textstats.Keyness

/** G² keyness invariants. Value-level oracle equivalence runs through
  * graft.Verify. */
class KeynessSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def run(docs: Seq[(String, String)], k: Int)
      : Seq[(String, Int, String, Long, Long, Double)] = {
    import spark.implicits._
    Keyness.keyTerms(docs.toDF("g", "text"), "g", "text", k)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
  }

  /** Independent G² from raw counts. */
  private def g2Of(a: Long, tt: Long, ng: Long, n: Long): Double = {
    def cell(o: Double, rt: Double, ct: Double): Double =
      if (o > 0) o * math.log(o * n / (rt * ct)) else 0.0
    2.0 * (cell(a.toDouble, tt.toDouble, ng.toDouble) +
      cell((tt - a).toDouble, tt.toDouble, (n - ng).toDouble) +
      cell((ng - a).toDouble, (n - tt).toDouble, ng.toDouble) +
      cell((n - ng - tt + a).toDouble, (n - tt).toDouble, (n - ng).toDouble))
  }

  test("a domain-exclusive term tops its domain's key list") {
    val docs = Seq(
      "sci" -> "quark boson quark lepton quark field",
      "sci" -> "quark field lepton",
      "cook" -> "flour sugar butter flour salt",
      "cook" -> "sugar flour salt")
    val got = run(docs, 3)
    val sciTop = got.filter(_._1 == "sci").minBy(_._2)
    assert(sciTop._3 == "quark" && sciTop._4 == 4 && sciTop._5 == 0)
    val cookTop = got.filter(_._1 == "cook").minBy(_._2)
    assert(cookTop._3 == "flour")
    // G2 parity with an independent computation (n=17 tokens)
    val want = g2Of(4, 4, 9, 17)
    assert(math.abs(sciTop._6 - want) < 1e-3, s"${sciTop._6} vs $want")
  }

  test("a term distributed exactly at expectation is not overused") {
    // "the" appears proportionally in both domains: 2 in g1 (4 tokens),
    // 4 in g2 (8 tokens) -> a*n == tt*ng, strict inequality excludes it
    val docs = Seq(
      "g1" -> "the x the y",
      "g2" -> "the p the q the r the s")
    assert(!run(docs, 10).exists(_._3 == "the"))
  }

  test("ranks are dense 1..k with G2 non-increasing") {
    val docs = Seq(
      "a" -> "alpha alpha alpha beta beta gamma delta",
      "b" -> "omega omega psi psi psi chi phi phi")
    run(docs, 4).groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) == (1 to sorted.length))
      val g2s = sorted.map(_._6)
      assert(g2s.zip(g2s.tail).forall { case (x, y) => x >= y })
    }
  }

  test("q121 over testdata: 5 per source, positive G2, overuse holds") {
    val rows = Keyness.sourceKeyTerms(spark, dir).collect()
    val bySrc = rows.groupBy(_.getString(0))
    assert(bySrc.size == 20)
    bySrc.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
      rs.foreach(r => assert(r.getDouble(5) > 0))
    }
  }
}
