package graft
// (TF-IDF and sampling specs appended for round 2)

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

  test("q37 tfidf: k rows per doc, rarer term outranks commoner term at equal tf") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana banana shared"),
      (2L, "apple cherry shared"),
      (3L, "apple shared"),
    ).toDF("doc_id", "text")
    val out = TextStats.tfidf(docs).cache()
    assert(out.groupBy("doc_id").count().filter(col("count") > TextStats.TfidfTopK).count() == 0)
    // doc 2: cherry (df=1) must outrank apple (df=3) and shared (df=3)
    val top2 = out.filter(col("doc_id") === 2 && col("rk") === 1).head()
    assert(top2.getString(1) == "cherry")
    // doc 1: banana has tf=2 AND df=1 — strictly top
    assert(out.filter(col("doc_id") === 1 && col("rk") === 1).head().getString(1) == "banana")
    val real = TextStats.tfidf(spark, dir)
    assert(real.groupBy("doc_id").count().filter(col("count") > TextStats.TfidfTopK).count() == 0)
  }

  test("q38 stratified sample: membership is deterministic and fractions are honored") {
    import operators.Sampling
    val base = Tables.customer(spark, dir)
    val s1 = Sampling.stratifiedSample(spark, dir).cache()
    val s2 = Sampling.stratifiedSample(spark, dir)
    // identical row set on re-run (the whole point vs RNG sampling)
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
    // per-stratum rates near their targets (hash uniformity; wide tolerance
    // at sf0.001's ~300 customers per segment)
    val rates = s1.groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = base.groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val auto = rates.getOrElse("AUTOMOBILE", 0L).toDouble / totals("AUTOMOBILE")
    assert(auto > 0.05 && auto < 0.5, s"AUTOMOBILE rate $auto far from 0.2")
    // subset property
    assert(s1.join(base, Seq("c_custkey"), "left_anti").count() == 0)
  }

  test("q60 domain mix: deterministic, subset, rates track the target mixture") {
    import operators.Sampling
    val docs = Tables.documents(spark, dir)
    val s1 = Sampling.domainMix(docs).cache()
    // re-run identical (hash membership, no RNG)
    assert(s1.exceptAll(Sampling.domainMix(docs)).count() == 0)
    // subset of the corpus
    assert(s1.join(docs, Seq("doc_id"), "left_anti").count() == 0)
    // mixture shape: en's quota (4/10 of N/2) implies a lower accept
    // RATE than de's (2/10 spread over ~3x fewer docs) on this corpus
    val kept = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rate = (l: String) => kept.getOrElse(l, 0L).toDouble / base(l)
    assert(rate("en") < rate("de"), s"en=${rate("en")} de=${rate("de")}")
    // every lang with positive weight is represented
    Sampling.MixWeights.foreach { case (l, _) =>
      assert(kept.getOrElse(l, 0L) > 0, s"$l dropped entirely") }
  }

  test("q64 rebalance: exhausted domain kept whole, shortfall re-granted to the rest") {
    import operators.Sampling
    val docs = Tables.documents(spark, dir)
    val out = Sampling.domainMixRebalanced(docs).cache()
    // deterministic + subset, like q60
    assert(out.exceptAll(Sampling.domainMixRebalanced(docs)).count() == 0)
    assert(out.join(docs, Seq("doc_id"), "left_anti").count() == 0)
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // zh (weight 5/10, rarest domain) must be exhausted: quota >= pop,
    // so EVERY zh doc survives
    val budget = base.values.sum / 2
    assert(budget * 5 / 10 >= base("zh"), "fixture drift: zh no longer exhausted")
    assert(kept("zh") == base("zh"), s"zh ${kept("zh")}/${base("zh")} not kept whole")
    // redistribution engaged: en's accept count exceeds its UNrebalanced
    // quota-implied expectation (quota_en/n_en of its population)
    val quotaEn = budget * 2 / 10
    assert(kept("en") > quotaEn, s"en kept ${kept("en")} <= bare quota $quotaEn — " +
      "shortfall not redistributed")
  }

  test("q61 quality score: hand-computed fixture and invariants") {
    import spark.implicits._
    import textstats.QualityModel
    // one doc, two tokens: replicate the exact weight math by hand
    val doc = Seq((1L, "aa bb")).toDF("doc_id", "text")
    def w(tok: String): Long = {
      val bucket = java.lang.Long.parseLong(
        functions.Hashing.md5hex(tok).substring(0, 12), 16) % QualityModel.Buckets
      java.lang.Long.parseLong(
        functions.Hashing.md5hex(s"${QualityModel.FeatureSeed}:$bucket")
          .substring(0, 12), 16) % 1001L - 500L
    }
    val row = QualityModel.qualityScore(doc).head()
    assert(row.getLong(1) == 2L)
    assert(row.getLong(2) == w("aa") + w("bb"), "score_sum != hand-derived weights")
    // corpus invariants: both labels occur, mean_w in weight range
    val out = QualityModel.qualityScore(spark, dir).cache()
    assert(out.filter(col("label") === 1).count() > 0)
    assert(out.filter(col("label") === 0).count() > 0)
    assert(out.filter(col("mean_w") < -500 || col("mean_w") > 500).count() == 0)
    out.unpersist()
  }

  test("q40 gopher repetition: hand-computed fixtures") {
    import spark.implicits._
    val docs = Seq(
      // "ab ab ab ab": 4 words, 1 distinct -> dup 0.75; top bigram
      // "ab ab" occurs 3x covering 3*4=12 of 8 non-space chars -> 1.5;
      // top trigram 2x covering 2*6=12/8 -> 1.5; fails everything
      (1L, "ab ab ab ab"),
      // 40 distinct 3-char words: dup 0, top bigram covers 6/120=0.05,
      // top trigram 9/120=0.075 -> passes all thresholds
      (2L, (1 to 40).map(i => f"w$i%02d").mkString(" ")),
      // single word: no bigrams/trigrams at all -> fracs 0
      (3L, "solo"))
      .toDF("doc_id", "text")
    val got = textstats.TextStats.gopherRepetition(docs)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getInt(5)))
    assert(got(0) == ((1L, 4L, 0.75, 1.5, 1.5, 0)))
    assert(got(1) == ((2L, 40L, 0.0, 0.05, 0.075, 1)))
    assert(got(2) == ((3L, 1L, 0.0, 0.0, 0.0, 1)))
  }

  test("q41 pii redact: scrubs planted emails/phones/ips, counts match, clean text is PII-free") {
    import spark.implicits._
    val docs = Seq(
      (0L, "hello world"),   // %3,%5,%6,%7 = 0 -> 2 emails + phone + ip
      (1L, "nothing here"),  // no injection
      (3L, "one email"),     // %3 only
      (35L, "phone and ip")) // %5 and %7
      .toDF("doc_id", "text")
    val got = textstats.Redact.piiRedact(docs).orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got(0)._3 == 2 && got(0)._4 == 1 && got(0)._5 == 1)
    assert(got(0)._2 == "hello world contact <EMAIL> cc <EMAIL> call <PHONE> from <IP>")
    assert(got(1) == ((1L, "nothing here", 0L, 0L, 0L)))
    assert(got(2)._3 == 1 && got(2)._4 == 0 && got(2)._5 == 0)
    assert(got(3) == ((35L, "phone and ip call <PHONE> from <IP>", 0L, 1L, 1L)))
    // nothing PII-shaped survives in any clean_text
    val df = textstats.Redact.piiRedact(spark, dir)
    assert(df.filter(col("clean_text").rlike(textstats.Redact.EmailRe)
      || col("clean_text").rlike(textstats.Redact.PhoneRe)
      || col("clean_text").rlike(textstats.Redact.Ipv4Re)).count() == 0)
  }

  test("q52 curation: verdicts consistent with components, reasons in priority order") {
    val df = textstats.Curation.curate(spark, dir).cache()
    assert(df.count() == Tables.documents(spark, dir).count())
    // keep <=> no reason
    assert(df.filter(col("keep") === 1 && col("drop_reason").isNotNull).count() == 0)
    assert(df.filter(col("keep") === 0 && col("drop_reason").isNull).count() == 0)
    // every 'dup' row really has a smaller canonical twin
    assert(df.filter(col("drop_reason") === "dup"
      && col("canonical_id") >= col("doc_id")).count() == 0)
    // reason priority: a doc failing repetition AND quality reports repetition
    val rep = textstats.TextStats.gopherRepetition(spark, dir)
      .select(col("doc_id"), col("repetition_pass"))
    val both = df.join(rep, "doc_id")
      .filter(col("repetition_pass") === 0 && col("drop_reason") === "quality")
    assert(both.count() == 0)
    // the pipeline actually curates: some kept, some dropped
    assert(df.select("keep").distinct().count() == 2)
  }

  test("q40 on sf0.001: both pass and fail outcomes occur, fracs non-negative") {
    val df = textstats.TextStats.gopherRepetition(spark, dir).cache()
    assert(df.count() == Tables.documents(spark, dir).count())
    assert(df.filter(col("dup_word_frac") < 0.0 || col("top2_char_frac") < 0.0).count() == 0)
    val outcomes = df.select("repetition_pass").distinct().count()
    assert(outcomes == 2, "thresholds should discriminate on testdata")
  }
}
