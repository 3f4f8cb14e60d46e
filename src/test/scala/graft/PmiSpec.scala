package graft

import org.scalatest.funsuite.AnyFunSuite

import textstats.Pmi

class PmiSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("perfectly-coupled pair: PMI = ln(D/n_ab), NPMI = 1") {
    // x and y appear in exactly the same 5 of 20 docs:
    // pmi = ln(5*20/(5*5)) = ln 4; npmi = ln4 / ln(20/5) = 1
    val rows = (0 until 5).map(i => (i.toLong, "x y filler" + i)) ++
      (5 until 20).map(i => (i.toLong, "filler" + i + " pad"))
    val got = Pmi.collocations(docs(rows), "doc_id", "text", minPairs = 5)
      .collect().map(r => (r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(6), r.getDouble(7)))
    val xy = got.find(t => t._1 == "x" && t._2 == "y").get
    assert(xy._3 == 5L)
    assert(math.abs(xy._4 - math.log(4.0)) < 1e-6)
    assert(xy._5 == 1.0)
  }

  test("independent pair scores ≈ 0 and ranks below a coupled pair") {
    // a,b co-occur in all 16 docs where each appears in 16 of 16 → pmi 0;
    // c,d co-occur in 8 of 16 docs, each df 8 → pmi = ln(8*16/64) = ln 2
    val rows = (0 until 16).map { i =>
      val cd = if (i < 8) " c d" else ""
      (i.toLong, s"a b$cd")
    }
    val got = Pmi.collocations(docs(rows), "doc_id", "text", minPairs = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getDouble(6)))
    val ab = got.find(t => t._2 == "a" && t._3 == "b").get
    val cd = got.find(t => t._2 == "c" && t._3 == "d").get
    assert(ab._4 == 0.0)
    assert(math.abs(cd._4 - math.log(2.0)) < 1e-6)
    assert(cd._1 < ab._1) // coupled pair ranks first
  }

  test("pairs below minPairs are dropped; per-doc duplicates count once") {
    // p q co-occur in 2 docs only (with repeats inside one doc)
    val rows = Seq((1L, "p q p q p"), (2L, "p q"), (3L, "p z"), (4L, "q z"),
      (5L, "z w"))
    val got = Pmi.collocations(docs(rows), "doc_id", "text", minPairs = 3)
      .collect()
    assert(!got.exists(r => r.getString(1) == "p" && r.getString(2) == "q"))
    val got2 = Pmi.collocations(docs(rows), "doc_id", "text", minPairs = 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(got2.contains(("p", "q", 2L))) // presence-counted, not 3 repeats
  }

  test("terms outside the top-N vocabulary generate no pairs") {
    // rare appears with x in 5 docs but vocabulary is capped at the 2
    // dominant terms (x, y) — rare never becomes a candidate
    val rows = (0 until 10).map { i =>
      (i.toLong, if (i < 5) "x y rare" else "x y")
    }
    val got = Pmi.collocations(docs(rows), "doc_id", "text",
      topTerms = 2, minPairs = 2)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(("x", "y")))
  }

  test("real corpus: every pair satisfies support and npmi ≤ 1") {
    val df = Pmi.docCollocations(spark, "/root/testdata/sf0.001").cache()
    assert(df.count() == 50)
    import org.apache.spark.sql.functions._
    assert(df.filter(col("n_ab") < 5 || col("npmi") > 1.0).count() == 0)
    assert(df.filter(col("term_a") >= col("term_b")).count() == 0)
  }
}
