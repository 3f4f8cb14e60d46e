package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Deduplication suite for LLM-training-data pipelines (SURVEY.md §2
  * #19–23) over the `documents` table.
  *
  * Scale design: no operator is ever O(n²) in the corpus. Candidate
  * generation is always hash/LSH bucketing, so the shuffles are
  * O(n·shingles) or O(n·bands); the only pairwise work happens inside
  * buckets. Hashing is md5-derived ([[graft.functions.Hashing]]) so every
  * operator has an exact DuckDB oracle — the `*Sql` builders here are the
  * single source of truth for those oracles, generated from the same
  * constants as the Spark plans so the two cannot drift.
  *
  * Reference provenance: the reference dedups via pandas
  * `validate='1:1'` merges and `distinct` (school_outcomes_etl.py); the
  * MinHash/SimHash/Jaccard/embedding operators are the scale
  * generalization a 100 TB corpus needs.
  */
object Dedup {

  // ---- shared shingling (3-word shingles, rolling-hash keys) ----

  /** Rolling-hash shingle keys: md5 each TOKEN once (short strings),
    * then derive each 3-gram's key arithmetically from its three
    * consecutive token hashes — two independent mixes
    * Σ_j (th[i+j]·c_j) mod p packed into a 62-bit long. Compared to
    * hashing materialized shingle strings this cuts md5 input bytes
    * ~50× and skips the per-shingle string allocation entirely, while
    * staying exactly reproducible in DuckDB (same integer arithmetic).
    * Collision space 2^62 → negligible at any corpus size, and
    * collisions are identical on both engines regardless. */
  val ShingleP: Long = 2147483647L // Mersenne prime 2^31-1
  private val MixCoefs: Seq[Long] =
    (0 until 6).map(k => Hashing.derivedConst("c", k, ShingleP - 1, 1))

  /** Per-token 31-bit hashes. MUST be materialized as its own projected
    * column before feeding [[shingleKeysFromHashes]] — passing the
    * expression directly would inline it into every element_at in the
    * shingle lambda and recompute all token md5s per shingle (O(n²)
    * hashing; measured 40× slower). */
  def tokenHashes(text: Column): Column =
    transform(split(text, " "), t => Hashing.hash48(t) % ShingleP)

  /** Shingle keys from a MATERIALIZED token-hash array column. */
  def shingleKeysFromHashes(th: Column, text: Column): Column = {
    def mix(i: Column, cs: Seq[Long]): Column =
      cs.zipWithIndex.map { case (c, j) =>
        (element_at(th, i + (j + 1)) * c) % ShingleP
      }.reduce(_ + _) % ShingleP
    when(size(th) >= 3,
      transform(sequence(lit(0), size(th) - 3), i =>
        mix(i, MixCoefs.take(3)) * lit(1L << 31) + mix(i, MixCoefs.drop(3))))
      .otherwise(array(Hashing.hash48(text)))
  }

  /** DuckDB twin of [[shingleKeysFromHashes]] over a `th` token-hash-list CTE var. */
  def shingleKeysSql(th: String, text: String): String = {
    def mixSql(cs: Seq[Long]): String =
      cs.zipWithIndex.map { case (c, j) =>
        s"($th[i + ${j + 1}] * $c) % $ShingleP"
      }.mkString("(", " + ", s") % $ShingleP")
    s"""CASE WHEN len($th) >= 3
       |  THEN list_transform(range(0, len($th) - 2), i ->
       |    ${mixSql(MixCoefs.take(3))} * ${1L << 31} + ${mixSql(MixCoefs.drop(3))})
       |  ELSE [${Hashing.hash48Sql(text)}] END""".stripMargin
  }

  /** Exploded (doc_id, shingle-key) rows — duplicates kept (cheap for
    * consumers that are duplicate-insensitive or aggregate them away). */
  private[graft] def docShingles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"), tokenHashes(col("text")).as("th"))
      .select(col("doc_id"),
        explode(shingleKeysFromHashes(col("th"), col("text"))).as("shk"))

  private[graft] val docShinglesSql: String =
    s"""th AS (SELECT doc_id, text,
       |  list_transform(string_split(text, ' '), t -> ${Hashing.hash48Sql("t")} % $ShingleP) AS th
       |FROM documents),
       |sh AS (SELECT doc_id, unnest(${shingleKeysSql("th", "text").replace("\n", " ")}) AS shk FROM th)""".stripMargin

  /** Distinct (doc_id, shingle-key) pairs: the Jaccard working set. */
  private[graft] val docShingleHashesSql: String =
    s"""$docShinglesSql,
       |shk AS (SELECT DISTINCT doc_id, shk FROM sh)""".stripMargin

  // ---- #19 exact dedup ----

  /** Exact dedup: md5(text) groups; canonical survivor = min doc_id.
    * At 100 TB this is one map-side-combined hash aggregate on a 32-hex
    * key — the cheapest possible full-corpus dedup. */
  def dedupExact(docs: DataFrame): DataFrame =
    docs
      .select(md5(col("text")).as("text_hash"), col("doc_id"))
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    dedupExact(Tables.documents(spark, dir))

  val dedupExactSql: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id, count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  // ---- #20 MinHash + LSH ----

  val MinhashK = 16      // signature length
  val MinhashBands = 4   // bands of K/Bands rows each
  private val RowsPerBand = MinhashK / MinhashBands

  /** Universal-hash family over the Mersenne prime 2^31-1: the K seeded
    * hashes are h_i = (a_i·(h mod p) + b_i) mod p derived from ONE md5
    * per shingle — 16× less hashing than K independent md5s, identical
    * arithmetic on both engines (products stay < 2^62, no overflow). */
  val MinhashP = 2147483647L
  /** (a_i, b_i) per signature position, a_i ∈ [1, p-1], b_i ∈ [0, p-1]. */
  val MinhashCoefs: Seq[(Long, Long)] =
    (0 until MinhashK).map(i =>
      (Hashing.derivedConst("a", i, MinhashP - 1, 1),
        Hashing.derivedConst("b", i, MinhashP, 0)))

  /** Per-doc (band, band_key) rows as a PURE PROJECTION + one explode:
    * each of the K min-hashes is `array_min` over the shingle-key array
    * (no per-shingle row explosion, no signature shuffle — a document's
    * signature never leaves its scan task). The only shuffles left are
    * the bucket groupBy and final distinct. Also the shape the streaming
    * twin needs: signatures of a stream are a stateless projection. */
  /** The raw k-column MinHash signature frame (doc_id, carry…,
    * mh0..mhK-1) — shared by the banding path and the q235 estimator
    * audit. */
  private[graft] def minhashFrame(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val keep = carry.map(col)
    val mhCols = MinhashCoefs.zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("sk"), k => ((k % MinhashP) * a + b) % MinhashP))
        .cast("string").as(s"mh$i")
    }
    docs
      .select(col("doc_id") +: col("text") +: keep :+ tokenHashes(col("text")).as("th"): _*)
      .select(col("doc_id") +: keep :+ shingleKeysFromHashes(col("th"), col("text")).as("sk"): _*)
      .select((col("doc_id") +: keep) ++ mhCols: _*)
  }

  private[graft] def bandedSignatures(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val keep = carry.map(col)
    val bandCols = (0 until MinhashBands).map { b =>
      val slice = (b * RowsPerBand until (b + 1) * RowsPerBand).map(i => col(s"mh$i"))
      md5(concat_ws(",", slice: _*)).as(s"band$b")
    }
    val stackExpr = (0 until MinhashBands).map(b => s"$b, band$b").mkString(", ")
    minhashFrame(docs, carry)
      .select((col("doc_id") +: keep) ++ bandCols: _*)
      .select(col("doc_id") +: keep :+
        expr(s"stack($MinhashBands, $stackExpr) AS (band, band_key)"): _*)
  }

  /** MinHash signatures banded into LSH buckets → candidate near-dup
    * pairs. Shuffles: one bucket groupBy of O(n·bands) tiny rows + the
    * final pair distinct; within-bucket pair expansion is bounded by
    * bucket size, and AQE's skew join splits any hot bucket. */
  def dedupMinhash(docs: DataFrame): DataFrame =
    bandedSignatures(docs)
      .groupBy(col("band"), col("band_key"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(col("ds")).as("doc_a"), col("ds"))
      .select(col("doc_a"), explode(filter(col("ds"), d => d > col("doc_a"))).as("doc_b"))
      .distinct()

  def dedupMinhash(spark: SparkSession, dir: String): DataFrame =
    dedupMinhash(Tables.documents(spark, dir))

  /** CTE chain ending in `buckets(doc_id, band, band_key)` — the DuckDB
    * twin of [[bandedSignatures]] over any (doc_id, text) relation
    * `src` (the whole `documents` table for the q20 family; the
    * paragraph frame for q339). */
  private[graft] def bucketsCtesSqlFrom(src: String): String = {
    val mins = (0 until MinhashK).map { i =>
      val (a, b) = MinhashCoefs(i)
      s"list_min(list_transform(sk, k -> ((k % $MinhashP) * $a + $b) % $MinhashP))::VARCHAR AS mh$i"
    }.mkString(",\n  ")
    val bands = (0 until MinhashBands).map { b =>
      val slice = (b * RowsPerBand until (b + 1) * RowsPerBand)
        .map(i => s"mh$i").mkString(" || ',' || ")
      s"md5($slice) AS band$b"
    }.mkString(",\n  ")
    val unions = (0 until MinhashBands)
      .map(b => s"SELECT doc_id, $b AS band, band$b AS band_key FROM banded")
      .mkString("\nUNION ALL\n")
    s"""th AS (SELECT doc_id, text,
       |  list_transform(string_split(text, ' '), t -> ${Hashing.hash48Sql("t")} % $ShingleP) AS th
       |FROM $src),
       |sk AS (SELECT doc_id, ${shingleKeysSql("th", "text").replace("\n", " ")} AS sk FROM th),
       |mh AS (SELECT doc_id,
       |  $mins
       |FROM sk),
       |banded AS (SELECT doc_id,
       |  $bands
       |FROM mh),
       |buckets AS (
       |$unions
       |)""".stripMargin
  }

  private[graft] val bucketsCtesSql: String = bucketsCtesSqlFrom("documents")

  val dedupMinhashSql: String =
    s"""WITH $bucketsCtesSql
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM buckets a JOIN buckets b
       |  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id""".stripMargin

  // ---- #21 SimHash ----

  val SimhashBits = 32

  /** 32-bit SimHash fingerprint: per-bit ±1 votes over all token
    * occurrences' 48-bit hashes, bit set where the vote is positive.
    * One explode + one hash aggregate with 32 sum expressions — map-side
    * combined, shuffle is O(n), no per-bit row blowup. */
  def dedupSimhash(docs: DataFrame): DataFrame = {
    val tokens = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("th", Hashing.hash48(col("tok")))
    val votes = tokens.groupBy(col("doc_id")).agg(
      sum((shiftright(col("th"), 0).bitwiseAND(1)) * 2 - 1).as("v0"),
      (1 until SimhashBits)
        .map(b => sum((shiftright(col("th"), b).bitwiseAND(1)) * 2 - 1).as(s"v$b")): _*)
    val fp = (0 until SimhashBits)
      .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    votes.select(col("doc_id"), fp.as("simhash"))
  }

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    dedupSimhash(Tables.documents(spark, dir))

  val dedupSimhashSql: String = {
    val votes = (0 until SimhashBits)
      .map(b => s"sum(((th >> $b) & 1) * 2 - 1) AS v$b").mkString(",\n  ")
    val fp = (0 until SimhashBits)
      .map(b => s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, ${Hashing.hash48Sql("tok")} AS th
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       |),
       |votes AS (SELECT doc_id,
       |  $votes
       |FROM toks GROUP BY doc_id)
       |SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM votes""".stripMargin
  }

  // ---- #22 n-gram Jaccard ----

  val JaccardThreshold = 0.6

  /** Near-dup pairs by exact 3-gram-shingle Jaccard ≥ threshold —
    * the plain inverted-index formulation, which is the DuckDB oracle's
    * mirror ([[ngramJaccardSql]]). Candidates come from posting-list
    * expansion: Σ_sh df(sh)² work, which one boilerplate shingle shared
    * by 10⁶ docs turns into 10¹² pairs — so the REGISTERED q22 path is
    * [[PrefixJaccard.ngramJaccardPrefix]] (result-identical, lossless
    * prefix filter; hot shingles generate zero candidates). This version
    * stays for the oracle twin and small-corpus use. */
  def ngramJaccard(docs: DataFrame): DataFrame = {
    // one explode + ONE shuffle builds the full inverted index:
    // shingle-hash -> sorted distinct doc list (collect_set also absorbs
    // repeated shingles within a doc, so no separate distinct pass)
    val byShk = docShingles(docs)
      .groupBy(col("shk"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
    // per-doc distinct-shingle counts, derived from the index via an
    // aggregate. NOT a projection on purpose: an aggregate is an
    // optimizer barrier, while a projected n_sh expression gets inlined
    // PAST the pair join and recomputed per candidate pair (measured
    // 40x slower — 1.1M pairs x full shingle pipeline per side)
    val counts = byShk
      .select(explode(col("ds")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // pair expansion inside each posting list: a < b, bounded by df(sh)
    val inter = byShk
      .filter(size(col("ds")) > 1)
      .select(explode(col("ds")).as("doc_a"), col("ds"))
      .select(col("doc_a"), explode(filter(col("ds"), d => d > col("doc_a"))).as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("ca.n_sh") + col("cb.n_sh") - col("n_inter")))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccard(Tables.documents(spark, dir))

  val ngramJaccardSql: String =
    s"""WITH $docShingleHashesSql,
       |counts AS (SELECT doc_id, count(*) AS n_sh FROM shk GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
       |  FROM shk a JOIN shk b ON a.shk = b.shk AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  round(n_inter * 1.0 / (ca.n_sh + cb.n_sh - n_inter), 4) AS jaccard
       |FROM inter
       |JOIN counts ca ON doc_a = ca.doc_id
       |JOIN counts cb ON doc_b = cb.doc_id
       |WHERE n_inter * 1.0 / (ca.n_sh + cb.n_sh - n_inter) >= $JaccardThreshold""".stripMargin
}
