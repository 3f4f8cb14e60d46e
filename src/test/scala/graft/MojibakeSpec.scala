package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import textstats.Mojibake

/** Mojibake detection (q268): hand-counted artifact cases, clean-text
  * zero, overlap independence of the four signatures, and the planted
  * registered shape. Value-level oracle equivalence runs through
  * graft.Verify. */
class MojibakeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def score(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Mojibake.mojibakeScore(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("clean text reads zero everywhere and is_clean = 1") {
    val r = score(Seq((1L, "a perfectly ordinary sentence")))(1L)
    assert(r.getLong(r.fieldIndex("n_utf8_digraph")) == 0L)
    assert(r.getLong(r.fieldIndex("n_replacement")) == 0L)
    assert(r.getDouble(r.fieldIndex("mojibake_ratio")) == 0.0)
    assert(r.getInt(r.fieldIndex("is_clean")) == 1)
  }

  test("each signature counts its own literal, independently") {
    val r = score(Seq(
      (1L, "cafÃ© and clichÃ© again Ã©"),   // 3 digraphs
      (2L, "donâ€™t â€™ quote"),           // 2 smart quotes
      (3L, "ï»¿leading bom"),              // 1 BOM
      (4L, "lossy � decode � twice �")))   // 3 replacement chars
    assert(r(1L).getLong(r(1L).fieldIndex("n_utf8_digraph")) == 3L)
    assert(r(1L).getLong(r(1L).fieldIndex("n_smart_quote")) == 0L)
    assert(r(2L).getLong(r(2L).fieldIndex("n_smart_quote")) == 2L)
    assert(r(3L).getLong(r(3L).fieldIndex("n_bom")) == 1L)
    assert(r(4L).getLong(r(4L).fieldIndex("n_replacement")) == 3L)
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(r(id).getInt(r(id).fieldIndex("is_clean")) == 0)
      assert(r(id).getDouble(r(id).fieldIndex("mojibake_ratio")) > 0.0)
    }
  }

  test("planted registered query: grades 0-3 all appear, clean docs stay clean") {
    val rows = Mojibake.plantedMojibake(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, r) =>
      assert(r.getLong(r.fieldIndex("n_utf8_digraph")) == id % 4)
      assert(r.getLong(r.fieldIndex("n_smart_quote")) == id % 4)
      assert(r.getLong(r.fieldIndex("n_bom")) == (if (id % 5 == 0) 1L else 0L))
      assert(r.getLong(r.fieldIndex("n_replacement")) == (if (id % 7 == 0) 1L else 0L))
      val planted = id % 4 != 0 || id % 5 == 0 || id % 7 == 0
      assert(r.getInt(r.fieldIndex("is_clean")) == (if (planted) 0 else 1))
    }
  }
}
