package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import textstats.RankFusion

/** Reciprocal-rank fusion (q172): hand-computed fusion, competition
  * (min) rank ties, and the registered consensus election. Value-level
  * oracle equivalence runs through graft.Verify. */
class RankFusionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fuse(rows: Seq[(String, Long, Long)], n: Int = 20) = {
    import spark.implicits._
    RankFusion.fuse(rows.toDF("doc_id", "sa", "sb").repartition(3),
      "sa", "sb", n).collect()
  }

  test("hand case: consensus beats either list's head") {
    // d1 leads list A but trails B; d2 is near the top of both
    val out = fuse(Seq(("d1", 100L, 5L), ("d2", 50L, 20L), ("d3", 10L, 10L)))
    assert(out.map(_.getString(0)).toSeq == Seq("d2", "d1", "d3"))
    val byDoc = out.map(r => r.getString(0) ->
      (r.getLong(r.fieldIndex("rank_a")), r.getLong(r.fieldIndex("rank_b")),
        r.getLong(r.fieldIndex("rrf_micro")))).toMap
    assert(byDoc("d2") == ((2L, 1L, 1000000L / 62 + 1000000L / 61)))
    assert(byDoc("d1") == ((1L, 3L, 1000000L / 61 + 1000000L / 63)))
    assert(byDoc("d3") == ((3L, 2L, 1000000L / 63 + 1000000L / 62)))
  }

  test("score ties share the competition rank; the next rank skips") {
    val out = fuse(Seq(("a", 9L, 1L), ("b", 9L, 2L), ("c", 5L, 3L)))
    val ra = out.map(r => r.getString(0) -> r.getLong(r.fieldIndex("rank_a"))).toMap
    assert(ra("a") == 1L && ra("b") == 1L && ra("c") == 3L)
  }

  test("top-n truncates deterministically by (rrf desc, doc_id)") {
    val rows = (1 to 30).map(i => (f"d$i%02d", (100 - i).toLong, i.toLong))
    val out = fuse(rows, n = 5)
    assert(out.length == 5)
    val rrfs = out.map(r => r.getLong(r.fieldIndex("rrf_micro"))).toSeq
    assert(rrfs == rrfs.sorted.reverse)
  }

  test("registered q172 at sf0.001: 20 distinct docs, monotone fused order") {
    val out = RankFusion.qualityFluencyConsensus(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 20)
    assert(out.map(_.getLong(0)).distinct.length == 20)
    val rrfs = out.map(r => r.getLong(r.fieldIndex("rrf_micro"))).toSeq
    assert(rrfs == rrfs.sorted.reverse)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("rank_quality")) >= 1L)
      assert(r.getLong(r.fieldIndex("rank_fluency")) >= 1L)
    }
  }
}
