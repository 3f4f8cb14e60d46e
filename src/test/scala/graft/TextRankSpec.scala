package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import textstats.TextRank

/** TextRank (q273): hub-word dominance on a hand graph, self-pair /
  * dedup rules, q65-oracle-regression via the builder refactor, and
  * the registered shape. Value-level oracle equivalence runs through
  * graft.Verify. */
class TextRankSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def rank(texts: Seq[String]) = {
    import spark.implicits._
    TextRank.textRank(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
  }

  test("a hub word adjacent to every other word ranks first") {
    // 'core' borders all six others; the others only border 'core'
    val texts = Seq("core alpha core beta core gamma",
      "core delta core epsilon core zeta")
    val got = rank(texts)
    assert(got.head._1 == "core")
    // hub centrality strictly dominates every leaf
    assert(got.tail.forall(_._2 < got.head._2))
    // undirected dedup: leaves are symmetric, equal centrality
    assert(got.tail.map(_._2).distinct.length == 1)
  }

  test("self-adjacency contributes no edge") {
    // 'rep rep rep' yields zero valid pairs — only the cross pair ranks
    val got = rank(Seq("rep rep rep link rep"))
    assert(got.map(_._1).toSet == Set("rep", "link"))
    // a 2-node symmetric graph: equal centrality
    assert(got(0)._2 == got(1)._2)
  }

  test("registered shape: top-20 keywords, centrality descending") {
    val rows = TextRank.docTextRank(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == TextRank.TopK)
    val cents = rows.map(_.getLong(1))
    assert(cents.zip(cents.tail).forall { case (a, b) => a >= b })
  }
}
