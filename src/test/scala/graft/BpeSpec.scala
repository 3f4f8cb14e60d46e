package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import textstats.Bpe

/** Exact-BPE semantics on planted vocabularies + trainer parity with
  * an in-memory reference implementation of Sennrich's algorithm.
  * Value-level oracle equivalence runs through graft.Verify. */
class BpeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  /** In-memory reference: leftmost-greedy single-merge application. */
  private def refApply(toks: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toList
  }

  private def refSegment(word: String, merges: Seq[(String, String)]): List[String] =
    merges.foldLeft(word.map(_.toString).toList) {
      case (t, (a, b)) => refApply(t, a, b)
    }

  private def segment(words: Seq[String], merges: Seq[(String, String)]): Map[String, (Long, String)] = {
    import spark.implicits._
    Bpe.segmentVocab(words.toDF("word"), merges)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
  }

  test("repeated-pair runs merge leftmost-greedy: aaaa -> aa aa, aaaaa -> aa aa a") {
    val got = segment(Seq("aaaa", "aaaaa", "abab", "aab"), Seq(("a", "a"), ("a", "b")))
    assert(got("aaaa") == ((2L, "aa aa")))
    assert(got("aaaaa") == ((3L, "aa aa a")))
    // (a,b) applies after (a,a): abab -> ab ab; aab -> aa b (aa ate the a)
    assert(got("abab") == ((2L, "ab ab")))
    assert(got("aab") == ((2L, "aa b")))
  }

  test("hierarchical merges: th -> the; b+at -> bat through two ranks") {
    val got = segment(Seq("the", "that", "batch", "theater"),
      Bpe.Merges)
    assert(got("the") == ((1L, "the")))
    assert(got("batch") == ((3L, "bat c h")))
    // 'that': t,h,a,t -> th,a,t -> (th,e no) -> th,at
    assert(got("that") == ((2L, "th at")))
    // every word reconstructs by deleting spaces
    got.foreach { case (w, (_, seg)) => assert(seg.replace(" ", "") == w) }
  }

  test("distributed segmentation equals the reference on every corpus word") {
    import org.apache.spark.sql.functions._
    val words = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("word"))
      .distinct().collect().map(_.getString(0)).toSeq
    val got = segment(words, Bpe.Merges)
    words.foreach { w =>
      val want = refSegment(w, Bpe.Merges)
      assert(got(w) == ((want.size.toLong, want.mkString(" "))),
        s"word '$w': got ${got(w)}, want $want")
    }
  }

  /** In-memory reference trainer (Sennrich get_stats: overlapping
    * adjacent pairs, frequency-weighted; argmax ties (count, a, b)). */
  private def refTrain(freqs: Map[String, Long], n: Int): Seq[(String, String)] = {
    var vocab = freqs.map { case (w, f) => (w.map(_.toString).toList, f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    for (_ <- 1 to n if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (toks, f) =>
        toks.zip(toks.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.isEmpty || counts.values.max < 2) done = true
      else {
        val (a, b) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        merges += ((a, b))
        vocab = vocab.map { case (t, f) => (refApply(t, a, b), f) }
      }
    }
    merges.toSeq
  }

  test("trainer reproduces the reference merge sequence on a planted corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low low low lower lower newest newest newest newest widest"),
      (2L, "widest widest newest low"))
      .toDF("doc_id", "text")
    val freqs = Map("low" -> 4L, "lower" -> 2L, "newest" -> 5L, "widest" -> 3L)
    val want = refTrain(freqs, 6)
    val got = Bpe.trainMerges(docs, 6)
    assert(got == want, s"got $got, want $want")
  }

  test("empty words (double-space artifacts) drop instead of diverging engines") {
    // Spark's sequence(1, 0) DESCENDS where DuckDB's generate_series
    // is empty — charSymbols must never reach it
    val got = segment(Seq("", "ab"), Seq(("a", "b")))
    assert(got == Map("ab" -> ((1L, "ab"))))
  }

  test("trainer stops when no pair repeats; trained merges segment their corpus") {
    import spark.implicits._
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    assert(Bpe.trainMerges(docs, 5).isEmpty) // every pair count is 1
    val docs2 = Seq((1L, "hug hug hug pug pug hugs")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs2, 3)
    assert(merges.nonEmpty)
    val seg = segment(Seq("hug", "pug", "hugs"), merges)
    seg.foreach { case (w, (_, s)) => assert(s.replace(" ", "") == w) }
    // 'ug' (count 6) is the first merge by any tie-break
    assert(merges.head == (("u", "g")))
  }
}
