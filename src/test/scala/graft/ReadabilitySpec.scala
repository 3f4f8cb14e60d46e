package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import textstats.Readability

/** Flesch readability (q221): exact hand-counted words/sentences/
  * vowel-group syllables and the exact FRE/FKG chains, the min-1
  * floors, zero-word exclusion, slice isolation. Value-level oracle
  * equivalence runs through graft.Verify. */
class ReadabilitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def rd(docs: Seq[(Long, String, String)]) = {
    import spark.implicits._
    Readability.readability(docs.toDF("doc_id", "slice", "text")
      .repartition(4))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  private def d(r: org.apache.spark.sql.Row, c: String): Double =
    r.getDouble(r.fieldIndex(c))

  test("one simple sentence: counts and both scores exact") {
    // 3 words, 1 sentence, 3 single-vowel-group syllables:
    // FRE = 206.835 − 1.015·3 − 84.6·1 = 119.19, FKG = −2.62
    val m = rd(Seq((1L, "a", "the cat sat.")))("a")
    assert(m.getLong(m.fieldIndex("words")) == 3L)
    assert(m.getLong(m.fieldIndex("sentences")) == 1L)
    assert(m.getLong(m.fieldIndex("syllables")) == 3L)
    assert(d(m, "fre_pooled") == 119.19)
    assert(d(m, "fk_grade_pooled") == -2.62)
    assert(d(m, "fre_mean") == 119.19)
  }

  test("terminator runs split sentences; vowel groups count syllables") {
    // "one two. three four! five?" → 5 words, 3 sentences,
    // syllables 2+1+1+1+2 = 7 → FRE = 86.7033
    val m = rd(Seq((1L, "a", "one two. three four! five?")))("a")
    assert(m.getLong(m.fieldIndex("sentences")) == 3L)
    assert(m.getLong(m.fieldIndex("syllables")) == 7L)
    assert(d(m, "fre_pooled") == 86.7033)
  }

  test("vowelless words floor at one syllable; no terminators floor at one sentence") {
    val m = rd(Seq((1L, "a", "zzz brr")))("a")
    assert(m.getLong(m.fieldIndex("sentences")) == 1L)
    assert(m.getLong(m.fieldIndex("syllables")) == 2L)
  }

  test("a whitespace-only doc is excluded AND counted in n_excluded") {
    val m = rd(Seq((1L, "a", "the cat sat."), (2L, "a", "  ")))("a")
    assert(m.getLong(m.fieldIndex("n_docs")) == 1L)
    // the r13 ADVICE fix: the zero-word doc no longer vanishes
    // silently — it is reported per slice
    assert(m.getLong(m.fieldIndex("n_excluded")) == 1L)
  }

  test("slices aggregate independently; mean differs from pooled") {
    val m = rd(Seq(
      (1L, "a", "the cat sat."), (2L, "a", "one two. three four! five?"),
      (3L, "b", "zzz")))
    // pooled uses summed counts (8 w, 4 s, 10 y); mean averages the
    // two per-doc scores (119.19 + 86.703333)/2 = 102.9467 (micro
    // floors carried exactly)
    assert(m("a").getLong(m("a").fieldIndex("n_docs")) == 2L)
    assert(d(m("a"), "fre_mean") == 102.9467)
    assert(m("b").getLong(m("b").fieldIndex("syllables")) == 1L)
  }
}
