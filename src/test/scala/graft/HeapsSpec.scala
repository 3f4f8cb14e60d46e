package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import textstats.Heaps

class HeapsSpec extends AnyFunSuite {
  lazy val spark = Engine.session()
  import spark.implicits._

  private def run(rows: Seq[(String, Long, String)]) =
    Heaps.heapsFit(rows.toDF("g", "doc_id", "text"), "g", "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).sortBy(_._1).toSeq

  test("exact power law V = N^0.5: beta 1/2, ln_k 0, r2 = 1") {
    // checkpoints (N, V) = (4,2), (16,4), (64,8): docs sized 4, 12, 48
    // with vocab arranged so each doc doubles V
    def doc(newTerms: Seq[String], fillTo: Int, filler: String) = {
      val pad = List.fill(fillTo - newTerms.size)(filler)
      (newTerms ++ pad).mkString(" ")
    }
    val rows = Seq(
      ("h", 1L, doc(Seq("a", "b"), 4, "a")),                        // N=4, V=2
      ("h", 2L, doc(Seq("c", "d"), 12, "a")),                       // N=16, V=4
      ("h", 3L, doc(Seq("e", "f", "g", "i"), 48, "a")))             // N=64, V=8
    val Seq((_, nDocs, beta, lnK, r2)) = run(rows)
    assert(nDocs == 3L)
    assert(math.abs(beta - 0.5) < 1e-5)
    assert(math.abs(lnK) < 1e-5)
    assert(math.abs(r2 - 1.0) < 1e-6)
  }

  test("closed vocabulary: V plateaus, beta near 0") {
    // every doc reuses the same 3 terms → V constant after doc 1
    val rows = (1 to 6).map(i => ("c", i.toLong, "x y z x y z"))
    val Seq((_, _, beta, _, _)) = run(rows)
    assert(beta < 0.05)
  }

  test("all-new-tokens corpus: V = N, beta = 1, ln_k = 0") {
    val rows = (1 to 4).map { i =>
      ("n", i.toLong, (1 to 5).map(j => s"t${i}_$j").mkString(" "))
    }
    val Seq((_, _, beta, lnK, r2)) = run(rows)
    assert(math.abs(beta - 1.0) < 1e-6)
    assert(math.abs(lnK) < 1e-6)
    assert(math.abs(r2 - 1.0) < 1e-6)
  }

  test("fewer than 3 docs: r2 NULL (q131 rule)") {
    val rows = Seq(("s", 1L, "a b"), ("s", 2L, "a c"))
    val Seq((_, nDocs, _, _, r2)) = run(rows)
    assert(nDocs == 2L)
    assert(r2.isNaN)
  }

  test("real corpus: closed-vocabulary sources read as low beta in [0,1)") {
    // the synthetic corpus draws from a ~30-term vocabulary, so every
    // source saturates early — exactly the plateau the operator is
    // built to flag: beta near 0 (a source that saturates in doc 1
    // reads beta = 0 with NULL r2 — zero y-variance)
    val df = Heaps.sourceHeaps(spark, "/root/testdata/sf0.001").cache()
    assert(df.count() ==
      Tables.documents(spark, "/root/testdata/sf0.001")
        .select(countDistinct("source")).collect().head.getLong(0))
    assert(df.filter(col("beta") < 0.0 || col("beta") >= 1.0).count() == 0)
    assert(df.filter(col("beta") > 0.5).count() == 0,
      "a template-like corpus must not read as open-vocabulary growth")
    assert(df.filter(col("r2").isNotNull && col("r2") <= 0.0).count() == 0)
  }
}
