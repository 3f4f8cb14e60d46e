package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import textstats.LangidEval

/** Langid confusion (q305): registered-matrix invariants — row shares
  * sum to ~1e6, diagonal dominance on the labeled corpus, and
  * consistency with q26's own is_match rate. Value-level oracle
  * equivalence runs through graft.Verify. */
class LangidEvalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  lazy val rows = LangidEval.langidConfusion(spark, "/root/testdata/sf0.001")
    .collect()

  test("shape and row-share accounting") {
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (actual, rs) =>
      val total = rs.map(_.getLong(3)).sum
      // ppm floors: the row sums to 1e6 minus at most (cells-1)
      assert(total <= 1000000L && total > 1000000L - rs.length,
        s"actual $actual")
    }
  }

  test("the dominant language is diagonal-dominant (the matrix is the point:" +
    " it SHOWS which minority languages the heuristic leaks)") {
    // en (the corpus majority) must classify to itself more than to any
    // other label; minority languages may leak — that leak is exactly
    // the finding this matrix exists to surface, so it is not asserted
    // away
    val en = rows.filter(_.getString(0) == "en")
    assert(en.nonEmpty)
    val diag = en.find(_.getString(1) == "en").map(_.getLong(2)).getOrElse(0L)
    assert(en.filter(_.getString(1) != "en").forall(_.getLong(2) <= diag))
  }

  test("matrix total equals the labeled corpus size") {
    val total = rows.map(_.getLong(2)).sum
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter("lang IS NOT NULL").count()
    assert(total == docs)
  }

  test("consistency with q26's is_match rate") {
    import org.apache.spark.sql.functions._
    val acc = textstats.TextStats.langid(spark, "/root/testdata/sf0.001")
      .agg(sum("is_match")).collect().head.getLong(0)
    val diag = rows.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    assert(diag == acc)
  }
}
