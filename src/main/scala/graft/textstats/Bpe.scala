package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Byte-pair-encoding tokenization — EXACT leftmost-greedy merge
  * application plus a corpus trainer, the Sennrich et al. 2016
  * (arXiv:1508.07909) subword algorithm every modern LM tokenizer
  * descends from. Token counting (q28) estimates cost; this operator
  * produces the actual segmentation a trained tokenizer would.
  *
  * Exactness: one merge round rewrites the symbol sequence of every
  * word under rule (a,b)→ab with BPE's canonical leftmost-greedy,
  * non-overlapping semantics. Overlapping candidate runs (rule (a,a)
  * on `aaaa` → `aa aa`, on `aaaaa` → `aa aa a`) are resolved with a
  * gaps-and-islands pass: consecutive candidate positions form an
  * island, and within an island exactly the odd-indexed candidates
  * merge. Every step is a discrete window/projection — no floats — so
  * the DuckDB twin (the same five-level window nest per round,
  * generated) agrees bit-for-bit.
  *
  * Scale shape — the key factorization: tokenization cost is
  * ∝ VOCABULARY (distinct words × word length), not corpus. The
  * symbol frame explodes distinct words only; merge rounds are
  * windows PARTITIONED BY WORD (thousands of independent tiny
  * partitions — no global sort, perfect parallelism); per-doc token
  * counts come from joining the segmented vocab back to the corpus
  * explode. A 100 TB corpus with a 10M-word vocabulary runs the
  * merge cascade on ~100 MB of symbols.
  */
object Bpe {

  /** Registered merge table (rank order) — hierarchical merges
    * (th→the, at→bat) and the ll pair exercise multi-level and
    * repeated-letter paths on the corpus vocabulary. */
  val Merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("a", "t"), ("e", "r"), ("o", "r"),
    ("a", "n"), ("i", "n"), ("l", "l"), ("s", "t"), ("r", "o"),
    ("u", "e"), ("b", "at"))

  /** One exact BPE merge round over a (word, rn, sym, ...) symbol
    * frame; `rn` must be dense 1..n per word and is renumbered on
    * output. Extra columns (e.g. a trainer's `freq`) pass through. */
  def applyMerge(syms: DataFrame, a: String, b: String): DataFrame = {
    val wOrd = Window.partitionBy(col("word")).orderBy(col("rn"))
    val extra = syms.columns.toSeq.filterNot(Set("word", "rn", "sym"))
    val cand = syms
      .withColumn("cand",
        coalesce(col("sym") === a && lead(col("sym"), 1).over(wOrd) === b,
          lit(false)))
    // islands of consecutive candidates (only rule (a,a) can produce
    // them); odd members merge, even members are the absorbed right half
    val keep = cand
      .withColumn("grp", col("rn") - row_number().over(
        Window.partitionBy(col("word"), col("cand")).orderBy(col("rn"))))
      .withColumn("keep", col("cand") && row_number().over(
        Window.partitionBy(col("word"), col("cand"), col("grp"))
          .orderBy(col("rn"))) % 2 === 1)
    keep
      .withColumn("absorbed",
        coalesce(lag(col("keep"), 1).over(wOrd), lit(false)))
      .filter(!col("absorbed"))
      .select((Seq(
        col("word"),
        row_number().over(wOrd).as("rn"),
        when(col("keep"), lit(a + b)).otherwise(col("sym")).as("sym")) ++
        extra.map(col)): _*)
  }

  /** Explode words into their initial character-symbol frame
    * (word, rn, sym) — the `sequence`+`substring` formulation shared
    * verbatim with the oracle. Empty words are dropped BEFORE the
    * sequence: Spark's `sequence(1, 0)` descends ([1, 0]) where
    * DuckDB's `generate_series(1, 0)` is empty — an empty string (a
    * double-space artifact upstream) would silently diverge the two
    * engines without this guard. */
  def charSymbols(vocab: DataFrame): DataFrame =
    vocab.filter(col("word") =!= "")
      .select(col("word"), explode(expr("sequence(1, length(word))")).as("rn"))
      .select(col("word"), col("rn"), expr("substring(word, rn, 1)").as("sym"))

  /** Segment a vocabulary under a merge table: (word, n_tokens,
    * segmented) with tokens space-joined in order. */
  def segmentVocab(vocab: DataFrame,
      merges: Seq[(String, String)] = Merges): DataFrame = {
    var syms = charSymbols(vocab)
    for (((a, b), i) <- merges.zipWithIndex) {
      syms = applyMerge(syms, a, b)
      // truncate the 5-windows-per-round plan every few merges; the
      // symbol frame is vocabulary-grade, so the materialization is tiny
      if ((i + 1) % 4 == 0 && i + 1 < merges.size)
        syms = syms.localCheckpoint(true)
    }
    syms.groupBy("word").agg(
      count(lit(1)).as("n_tokens"),
      array_join(
        transform(array_sort(collect_list(struct(col("rn"), col("sym")))),
          e => e("sym")),
        " ").as("segmented"))
  }

  /** q81: the corpus vocabulary segmented under [[Merges]], weighted
    * by corpus frequency — (word, freq, n_tokens, segmented). */
  def bpeSegment(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    words.join(segmentVocab(words.select("word")), "word")
      .select(col("word"), col("freq"), col("n_tokens"), col("segmented"))
  }

  /** Train `nMerges` BPE merges on the corpus word-frequency table —
    * Sennrich's algorithm verbatim: each round counts every adjacent
    * symbol pair weighted by word frequency (overlaps included, as in
    * the reference implementation), takes the argmax (ties broken
    * (count DESC, a, b) for determinism), applies the merge exactly,
    * repeats. Each round is ONE map-side-combined aggregate over the
    * vocabulary-grade symbol frame + a 1-row collect (dimension-grade
    * driver state, the q60 precedent); the apply is [[applyMerge]].
    * Stops early when no pair repeats. */
  def trainMerges(docs: DataFrame, nMerges: Int): Seq[(String, String)] = {
    val words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    var syms = charSymbols(words.select("word"))
      .join(words, "word")
      .localCheckpoint(true)
    val wOrd = Window.partitionBy(col("word")).orderBy(col("rn"))
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    for (i <- 1 to nMerges if !done) {
      val top = syms
        .withColumn("nxt", lead(col("sym"), 1).over(wOrd))
        .filter(col("nxt").isNotNull)
        .groupBy(col("sym"), col("nxt")).agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("sym"), col("nxt"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < 2) done = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        out += ((a, b))
        syms = applyMerge(syms, a, b).localCheckpoint(true)
      }
    }
    out.toSeq
  }

  /** DuckDB twin of q81: the identical five-window merge round,
    * unrolled once per merge rank. */
  val bpeSegmentSql: String = {
    val rounds = Merges.zipWithIndex.map { case ((a, b), i) =>
      def q(s: String) = s.replace("'", "''")
      s"""s${i + 1} AS (
         |  SELECT word, row_number() OVER (PARTITION BY word ORDER BY rn) AS rn,
         |    CASE WHEN keep THEN '${q(a + b)}' ELSE sym END AS sym
         |  FROM (
         |    SELECT *, coalesce(lag(keep) OVER (PARTITION BY word ORDER BY rn), false) AS absorbed
         |    FROM (
         |      SELECT *, cand AND (row_number() OVER (PARTITION BY word, cand, grp ORDER BY rn) % 2 = 1) AS keep
         |      FROM (
         |        SELECT *, rn - row_number() OVER (PARTITION BY word, cand ORDER BY rn) AS grp
         |        FROM (
         |          SELECT word, rn, sym,
         |            coalesce(sym = '${q(a)}' AND lead(sym) OVER (PARTITION BY word ORDER BY rn) = '${q(b)}', false) AS cand
         |          FROM s$i))))
         |  WHERE NOT absorbed)""".stripMargin
    }.mkString(",\n")
    s"""WITH words AS (
       |  SELECT word, count(*) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE word <> '' GROUP BY 1),
       |s0 AS (
       |  SELECT word, rn, substr(word, CAST(rn AS INT), 1) AS sym FROM (
       |    SELECT word, unnest(generate_series(1, length(word))) AS rn
       |    FROM words)),
       |$rounds,
       |seg AS (
       |  SELECT word, count(*) AS n_tokens,
       |    string_agg(sym, ' ' ORDER BY rn) AS segmented
       |  FROM s${Merges.size} GROUP BY word)
       |SELECT words.word, words.freq, seg.n_tokens, seg.segmented
       |FROM words JOIN seg ON words.word = seg.word""".stripMargin
  }
}
