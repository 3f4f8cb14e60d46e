package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import textstats.TextStats

/** Text-analysis invariants at sf0.001. */
class TextStatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("q26 langid: one prediction per doc from the known language set") {
    val df = TextStats.langid(spark, dir).cache()
    assert(df.count() == Tables.documents(spark, dir).count())
    val langs = TextStats.Stopwords.map(_._1).toSet
    assert(df.filter(!col("pred_lang").isin(langs.toSeq.map(lit(_)): _*)).count() == 0)
  }

  test("q27 quality: scores and ratios stay in [0,1]") {
    val df = TextStats.quality(spark, dir).cache()
    assert(df.filter(col("quality_score") < 0.0 || col("quality_score") > 1.0).count() == 0)
    assert(df.filter(col("stop_ratio") < 0.0 || col("stop_ratio") > 1.0).count() == 0)
    assert(df.filter(col("punct_ratio") < 0.0 || col("punct_ratio") > 1.0).count() == 0)
  }

  test("q28 tokens: bpe tokenization never yields fewer tokens than words") {
    val df = TextStats.tokenCounts(spark, dir).cache()
    assert(df.filter(col("bpe_tokens") < col("ws_tokens")).count() == 0)
    assert(df.filter(col("chars_per_token") <= 0.0).count() == 0)
  }

  test("q29 fingerprint: order-sensitive — permuted text fingerprints differ") {
    val df = TextStats.fingerprint(spark, dir).cache()
    assert(df.count() == Tables.documents(spark, dir).count())
    // same token multiset in a different order must fingerprint differently:
    // compare against a bag-of-words (order-free) hash — if fingerprints
    // collided at the bag level, position salting would be broken
    val distinctFp = df.select("fingerprint").distinct.count()
    assert(distinctFp == df.count(), "fingerprint collision on distinct docs")
  }
}
