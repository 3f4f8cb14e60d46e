package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import dedup.{Containment, PrefixJaccard}

/** Shingle containment (q193): the quote-in-page case Jaccard is blind
  * to, directionality, the threshold boundary, and the MinShingles
  * noise guard. Losslessness of the prefix/length filters is proven by
  * the all-pairs DuckDB oracle through graft.Verify. */
class ContainmentSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  private def pairs(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    Containment.containmentPairs(docs.toDF("doc_id", "text").repartition(3))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
  }

  // A: 10 words (8 shingles); B embeds A verbatim inside 40 more words
  private val quote = words("a", 10)
  private val page = quote + " " + words("z", 40)
  private val docs = Seq((1L, quote), (2L, page))

  test("a verbatim quote in a long page: C(quote→page) = 1.0") {
    val m = pairs(docs)
    val r = m((1L, 2L))
    assert(r.getLong(r.fieldIndex("na")) == 8L)
    assert(r.getDouble(r.fieldIndex("containment")) == 1.0)
  }

  test("the same pair is INVISIBLE to q22's symmetric Jaccard") {
    import spark.implicits._
    val j = PrefixJaccard.ngramJaccardPrefix(
      docs.toDF("doc_id", "text")).collect()
    assert(j.isEmpty, "J = 8/48 is far below the 0.6 Jaccard threshold")
  }

  test("directional: the page is NOT contained in the quote") {
    assert(!pairs(docs).contains((2L, 1L)))
  }

  test("threshold boundary: 4/8 shared shingles = 0.5 is in, 3/8 is out") {
    // B shares A's first 6 words → A-shingles 1..4 → C = 0.5
    val in = pairs(Seq((1L, quote),
      (2L, (1 to 6).map(i => s"a$i").mkString(" ") + " " + words("y", 30))))
    assert(in((1L, 2L)).getDouble(in((1L, 2L)).fieldIndex("containment"))
      == 0.5)
    // B shares only A's first 5 words → 3 shingles → 0.375 < 0.5
    val out = pairs(Seq((1L, quote),
      (2L, (1 to 5).map(i => s"a$i").mkString(" ") + " " + words("y", 30))))
    assert(!out.contains((1L, 2L)))
  }

  test("a tiny snippet below MinShingles never scores") {
    // 5 words → 3 shingles < 5, fully contained
    val m = pairs(Seq((1L, words("a", 5)),
      (2L, words("a", 5) + " " + words("z", 40))))
    assert(!m.contains((1L, 2L)))
  }
}
