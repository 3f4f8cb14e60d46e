package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import dedup.Dedup

/** Dedup-suite invariants at sf0.001. Value-level equivalence vs DuckDB
  * runs through graft.Verify + tools/verify_local.py. */
class DedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("q19 exact dedup: canonical ids are unique and counts sum to corpus") {
    val df = Dedup.dedupExact(spark, dir).cache()
    val n = Tables.documents(spark, dir).count()
    assert(df.select(sum("n_copies")).head.getLong(0) == n)
    assert(df.select("canonical_id").distinct.count() == df.count())
  }

  test("q20 minhash LSH: finds the high-jaccard planted pairs, pairs canonical a<b") {
    val pairs = Dedup.dedupMinhash(spark, dir).cache()
    assert(pairs.filter(col("doc_a") >= col("doc_b")).count() == 0)
    // every pair with true jaccard >= 0.9 must be caught by 4x4 banding
    val trueDups = Dedup.ngramJaccard(spark, dir).filter(col("jaccard") >= 0.9)
    val missed = trueDups.join(pairs, Seq("doc_a", "doc_b"), "left_anti")
    assert(missed.count() == 0)
  }

  test("q21 simhash: deterministic, and near-dup pairs have close fingerprints") {
    val fp = Dedup.dedupSimhash(spark, dir).cache()
    assert(fp.count() == Tables.documents(spark, dir).count())
    // hamming distance between planted near-dups is far below random (~16)
    val pairs = Dedup.ngramJaccard(spark, dir).filter(col("jaccard") >= 0.9)
    val joined = pairs
      .join(fp.withColumnRenamed("simhash", "ha"), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(fp.withColumnRenamed("simhash", "hb"), col("doc_b") === col("doc_id"))
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
    if (joined.count() > 0)
      assert(joined.agg(max("hamming")).head.getInt(0) <= 8)
  }

  test("prefix-filtered jaccard (scale path) is result-identical to the exact join") {
    val plain = Dedup.ngramJaccard(spark, dir)
    val prefix = dedup.PrefixJaccard.ngramJaccardPrefix(spark, dir)
    assert(plain.exceptAll(prefix).count() == 0)
    assert(prefix.exceptAll(plain).count() == 0)
  }

  test("prefix jaccard: a planted hot shingle (df=2000) yields zero candidates") {
    // 2000 docs, each with 3 unique tokens followed by the same
    // boilerplate trigram: the shared shingle's df is 2000, so the plain
    // posting-list join would expand ~2M pairs from it. The prefix
    // filter must place it outside every document's rarity prefix and
    // generate NO candidates at all.
    import spark.implicits._
    val docs = (0 until 2000)
      .map(i => (i.toLong, s"u${i}a u${i}b u${i}c common1 common2 common3"))
      .toDF("doc_id", "text")
    val sh = Dedup.docShingles(docs).distinct().cache()
    val hotDf = sh.groupBy("shk").count().agg(max("count")).head.getLong(0)
    assert(hotDf == 2000, s"planted shingle df $hotDf")
    assert(dedup.PrefixJaccard.candidates(sh).count() == 0)
    assert(dedup.PrefixJaccard.ngramJaccardPrefix(docs).count() == 0)
  }

  test("prefix jaccard: identity holds on a corpus WITH the planted hot shingle") {
    // small enough that the plain join's 200²/2 hot-shingle pairs are
    // still runnable: both paths must agree exactly, including the
    // all-shingles-shared-except-unique-prefix near-dups
    import spark.implicits._
    val docs = (0 until 200)
      .map(i => (i.toLong, s"u${i % 150}a u${i % 150}b u${i % 150}c common1 common2 common3"))
      .toDF("doc_id", "text")
    val plain = Dedup.ngramJaccard(docs)
    val prefix = dedup.PrefixJaccard.ngramJaccardPrefix(docs)
    assert(plain.exceptAll(prefix).count() == 0)
    assert(prefix.exceptAll(plain).count() == 0)
    assert(plain.count() > 0) // the i%150 collisions are exact dups: J=1
  }

  test("q22 ngram jaccard: symmetric-free, thresholded, jaccard in (0,1]") {
    val df = Dedup.ngramJaccard(spark, dir).cache()
    assert(df.filter(col("jaccard") < Dedup.JaccardThreshold || col("jaccard") > 1.0).count() == 0)
    assert(df.filter(col("doc_a") >= col("doc_b")).count() == 0)
  }

  test("bloom: no false negatives, bounded false positives, SQL surface works") {
    import spark.implicits._
    import dedup.Bloom
    val member = (0L until 2000L).map(i => s"member-$i").toDF("k")
    val bloom = Bloom.bloomBytes(member, col("k"), 2000L)
    // every inserted key probes true — the property the pruning
    // correctness of q59 rests on
    assert(member.filter(!Bloom.mightContain(bloom, col("k"))).count() == 0)
    // disjoint probes: false-positive rate within ~3x of the 3% target
    val probes = (0L until 2000L).map(i => s"absent-$i").toDF("k")
    val fp = probes.filter(Bloom.mightContain(bloom, col("k"))).count()
    assert(fp < 2000 * Bloom.DefaultFpp * 3, s"fp=$fp out of bounds")
    // the injected SQL names work on an Engine session too
    member.createOrReplaceTempView("bloom_spec_member")
    val viaSql = spark.sql(
      s"SELECT bloom_agg(xxhash64(k), 2000, 16384) AS bf FROM bloom_spec_member")
      .head.getAs[Array[Byte]](0)
    assert(viaSql.nonEmpty)
  }

  test("bloomBytes honors sizes past Spark's silent 4e6/64Mbit clamp caps") {
    import spark.implicits._
    import dedup.Bloom
    // 1e7 items @ 1% fpp needs ~9.6e7 bits — ABOVE the default
    // spark.sql.optimizer.runtime.bloomFilter.maxNumBits (67108864);
    // without the conf raise the aggregate silently truncates there
    val wantBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(10000000L, 0.01)
    assert(wantBits > 67108864L)
    val tiny = Seq("a", "b").toDF("k")
    val bytes = Bloom.bloomBytes(tiny, col("k"), 10000000L, 0.01)
    assert(bytes.length.toLong * 8 >= wantBits,
      s"sketch ${bytes.length}B < requested $wantBits bits — conf clamp hit")
    // the temporary conf raise must not leak into the session
    val after = spark.conf.getOption(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
    assert(!after.exists(_.toLong >= wantBits), s"conf leaked: $after")
  }

  test("q59 prebuilt-sketch overload is result-identical to the fused path") {
    import dedup.Bloom
    val docs = Tables.documents(spark, dir)
    val bloom = Bloom.corpusBloom(docs)
    val pre = Bloom.bloomDedup(docs, bloom)
    val fused = Bloom.bloomDedup(docs)
    assert(pre.exceptAll(fused).count() == 0 && fused.exceptAll(pre).count() == 0)
    assert(pre.count() > 0)
  }

  test("q59 bloom dedup: result identical to the bare exact-membership join") {
    import dedup.Bloom
    val docs = Tables.documents(spark, dir)
    val got = Bloom.bloomDedup(docs)
    // brute-force reference: no bloom anywhere
    val corpus = docs.filter(col("doc_id") % Bloom.BatchMod =!= 0)
      .select(col("doc_id").as("cid"), md5(col("text")).as("h"))
    val ref = docs.filter(col("doc_id") % Bloom.BatchMod === 0)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .join(corpus, Seq("h"), "left")
      .groupBy("doc_id").agg(min("cid").as("matched_id"))
      .select(col("doc_id"),
        col("matched_id").isNotNull.cast("int").as("in_corpus"), col("matched_id"))
    assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0)
    assert(got.count() > 0)
  }
}
