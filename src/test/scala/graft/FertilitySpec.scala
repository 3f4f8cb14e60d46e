package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import textstats.Fertility

/** Tokenizer fertility (q237): exact q28-convention counts, the
  * punctuation and digit fertility drivers, zero-word exclusion,
  * slice isolation. Value-level oracle equivalence runs through
  * graft.Verify. */
class FertilitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def fert(docs: Seq[(String, String)]) = {
    import spark.implicits._
    Fertility.fertility(docs.toDF("slice", "text").repartition(4))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  private def d(r: org.apache.spark.sql.Row, c: String): Double =
    r.getDouble(r.fieldIndex(c))

  test("plain letter words have fertility 1") {
    val m = fert(Seq(("a", "ab cd")))("a")
    assert(m.getLong(m.fieldIndex("ws_tokens")) == 2L)
    assert(m.getLong(m.fieldIndex("bpe_tokens")) == 2L)
    assert(d(m, "fertility") == 1.0)
    assert(d(m, "chars_per_token") == 2.5)
  }

  test("punctuation splits subwords: don't → 3 tokens, fertility 2") {
    // "don't stop": bpe = don / ' / t / stop = 4, ws = 2
    val m = fert(Seq(("a", "don't stop")))("a")
    assert(m.getLong(m.fieldIndex("bpe_tokens")) == 4L)
    assert(d(m, "fertility") == 2.0)
  }

  test("digits tokenize one-by-one: a1b2 has fertility 4") {
    val m = fert(Seq(("a", "a1b2")))("a")
    assert(m.getLong(m.fieldIndex("bpe_tokens")) == 4L)
    assert(d(m, "fertility") == 4.0)
  }

  test("whitespace-only docs are excluded and counted") {
    val m = fert(Seq(("a", "ab cd"), ("a", "   ")))("a")
    assert(m.getLong(m.fieldIndex("n_docs")) == 1L)
    assert(m.getLong(m.fieldIndex("n_excluded")) == 1L)
  }

  test("slices aggregate independently") {
    val m = fert(Seq(("a", "ab cd"), ("b", "a1b2")))
    assert(d(m("a"), "fertility") == 1.0)
    assert(d(m("b"), "fertility") == 4.0)
  }
}
