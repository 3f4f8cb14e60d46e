package graft.textstats

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Text-analysis operators for training-data curation (SURVEY.md §2
  * #26–29) over the `documents` table. All single-pass, projection-only
  * or one-aggregation plans — at 100 TB each is a pruned scan plus at
  * most one map-side-combined hash aggregate.
  */
object TextStats {

  /** Stopword lists for the n-gram/stopword language-ID heuristic.
    * Deterministic, tiny, embedded as literals (broadcast-free). */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "von", "nicht"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "les"))

  private def tokensOf(text: Column): Column = split(text, " ")
  private def tokens: Column = tokensOf(col("text"))

  private def stopCountOf(text: Column, lang: String): Column = {
    val set = Stopwords.toMap.apply(lang)
    size(filter(tokensOf(text), t => t.isin(set.map(lit(_)): _*)))
  }
  private def stopCount(lang: String): Column = stopCountOf(col("text"), lang)

  private def stopCountSql(lang: String): String = {
    val set = Stopwords.toMap.apply(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(string_split(text, ' '), t -> list_contains([$set], t)))"
  }

  // ---- #26 language ID ----

  /** Heuristic language ID: stopword-occurrence score per language,
    * argmax with a fixed priority order (de > en > es > fr on ties —
    * alphabetical, matching the CASE chain in the oracle). Purely
    * per-row projection: no shuffle at any scale. */
  def langid(docs: DataFrame): DataFrame = {
    val langs = Stopwords.map(_._1)
    val scored = docs
      .select(Seq(col("doc_id"), col("lang")) ++
        langs.map(l => stopCount(l).as(s"s_$l")): _*)
    // argmax via CASE chain in declared (alphabetical) order
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last): Column) {
      case ((l, i), elseCol) =>
        val rest = langs.drop(i + 1)
        val isMax = rest.map(r => col(s"s_$l") >= col(s"s_$r")).reduce(_ && _)
        when(isMax, lit(l)).otherwise(elseCol)
    }
    scored
      .withColumn("pred_lang", pred)
      .withColumn("is_match", (col("pred_lang") === col("lang")).cast("int"))
      .select(Seq(col("doc_id")) ++ langs.map(l => col(s"s_$l")) ++
        Seq(col("pred_lang"), col("is_match")): _*)
  }

  def langid(spark: SparkSession, dir: String): DataFrame =
    langid(Tables.documents(spark, dir))

  val langidSql: String = {
    val langs = Stopwords.map(_._1)
    val scores = langs.map(l => s"${stopCountSql(l)} AS s_$l").mkString(",\n  ")
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1)
      val cond = rest.map(r => s"s_$l >= s_$r").mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString("\n    ")
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |  $scores
       |  FROM documents)
       |SELECT doc_id, ${langs.map(l => s"s_$l").mkString(", ")},
       |  CASE $cases ELSE '${langs.last}' END AS pred_lang,
       |  CAST(CASE $cases ELSE '${langs.last}' END = lang AS INT) AS is_match
       |FROM scored""".stripMargin
  }

  // ---- #27 quality score ----

  /** Quality scoring: length, token count, mean token length, stopword
    * ratio, punctuation ratio, composited into [0,1]. The formula is the
    * reference's "derived ratio columns" pattern (app_data.R:34-38)
    * applied to text curation. Per-row projection only. */
  def quality(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_chars2", length(col("text")))
      .withColumn("n_tokens", size(tokens))
      .withColumn("mean_tok_len",
        (col("n_chars2") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
      .withColumn("stop_ratio", stopCount("en").cast("double") / col("n_tokens"))
      .withColumn("punct_ratio", // greatest guards empty text (0 chars)
        length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double")
          / greatest(col("n_chars2"), lit(1)))
      // the ONE quality formula (shared with Curation's fused plan)
      .withColumn("quality_score", qualityScoreExpr(col("text")))
      .select(col("doc_id"), col("n_tokens"),
        round(col("mean_tok_len"), 4).as("mean_tok_len"),
        round(col("stop_ratio"), 4).as("stop_ratio"),
        round(col("punct_ratio"), 4).as("punct_ratio"),
        round(col("quality_score"), 4).as("quality_score"))

  def quality(spark: SparkSession, dir: String): DataFrame =
    quality(Tables.documents(spark, dir))

  /** THE quality_score formula (rounded to 4 like the query output) —
    * the single Spark-side definition, used by [[quality]] itself and
    * by [[Curation]]'s fused single-scan plan. The SQL twin lives in
    * [[qualitySql]]; the q52 oracle nests that twin, so any drift
    * between the two sides shows up as a q52 hash mismatch. */
  private[graft] def qualityScoreExpr(text: Column): Column = {
    val nTokens = size(tokensOf(text))
    val stopRatio = stopCountOf(text, "en").cast("double") / nTokens
    val punctRatio = length(regexp_replace(text, "[a-z0-9 ]", "")).cast("double") /
      greatest(length(text), lit(1))
    round(
      least(nTokens.cast("double") / 50.0, lit(1.0)) * 0.4 +
        least(stopRatio * 5.0, lit(1.0)) * 0.4 +
        (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.2, 4)
  }

  val qualitySql: String =
    s"""WITH base AS (
       |  SELECT doc_id, length(text) AS nc, len(string_split(text, ' ')) AS n_tokens,
       |    ${stopCountSql("en")} AS n_stop,
       |    length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct
       |  FROM documents),
       |rat AS (
       |  SELECT doc_id, n_tokens,
       |    (nc - (n_tokens - 1)) * 1.0 / n_tokens AS mean_tok_len,
       |    n_stop * 1.0 / n_tokens AS stop_ratio,
       |    n_punct * 1.0 / greatest(nc, 1) AS punct_ratio
       |  FROM base)
       |SELECT doc_id, n_tokens,
       |  round(mean_tok_len, 4) AS mean_tok_len,
       |  round(stop_ratio, 4) AS stop_ratio,
       |  round(punct_ratio, 4) AS punct_ratio,
       |  round(least(n_tokens / 50.0, 1.0) * 0.4 + least(stop_ratio * 5.0, 1.0) * 0.4
       |        + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2, 4) AS quality_score
       |FROM rat""".stripMargin

  // ---- #28 token counting ----

  val BpePattern = "[a-z]+|[0-9]|[^a-z0-9\\s]"

  /** Token counts: whitespace split and a BPE-ish regex segmentation
    * (letter runs / single digits / single symbols), plus chars-per-token
    * — the compression-rate proxy used to price documents in tokens. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs
      .withColumn("ws_tokens", size(tokens))
      .withColumn("bpe_tokens", regexp_count(col("text"), lit(BpePattern)))
      .select(col("doc_id"), col("n_chars"), col("ws_tokens"), col("bpe_tokens"),
        // greatest guards whitespace-only text (0 bpe tokens)
        round(col("n_chars").cast("double") / greatest(col("bpe_tokens"), lit(1)), 4)
          .as("chars_per_token"))

  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    tokenCounts(Tables.documents(spark, dir))

  val tokenCountsSql: String =
    s"""SELECT doc_id, n_chars, len(string_split(text, ' ')) AS ws_tokens,
       |  len(regexp_extract_all(text, '$BpePattern')) AS bpe_tokens,
       |  round(n_chars * 1.0 / greatest(len(regexp_extract_all(text, '$BpePattern')), 1), 4) AS chars_per_token
       |FROM documents""".stripMargin

  // ---- #29 document fingerprint ----

  /** Position-salted rolling-hash fingerprint: Σ_pos hash48(pos:token).
    * Order-sensitive (unlike a bag-of-words hash) yet associative enough
    * to compute as ONE map-side-combined sum aggregate — the cheap
    * content-identity check for 100 TB re-crawl reconciliation. 48-bit
    * hashes keep the i64 sum overflow-free below ~32k tokens/doc. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "tok")))
      .select(col("doc_id"),
        Hashing.hash48(concat((col("pos0") + 1).cast("string"), lit(":"), col("tok"))).as("h"))
      .groupBy(col("doc_id"))
      .agg(sum(col("h")).as("fingerprint"), count(lit(1)).as("n_tokens"))

  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    fingerprint(Tables.documents(spark, dir))

  val fingerprintSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    generate_subscripts(string_split(text, ' '), 1) AS pos,
       |    unnest(string_split(text, ' ')) AS tok
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(sum(${Hashing.hash48Sql("(pos)::VARCHAR || ':' || tok")}) AS BIGINT) AS fingerprint,
       |  count(*) AS n_tokens
       |FROM toks GROUP BY doc_id""".stripMargin

  // ---- #41 TF-IDF top terms ----

  val TfidfTopK = 5

  /** Per-document top-k terms by tf·idf. The idf weight is the RATIONAL
    * (N+1)/(df+1) rather than its logarithm: a transcendental here
    * would rank by doubles whose last ulp differs between libm
    * implementations (SURVEY.md §5 — ln is not guaranteed correctly
    * rounded), while the rational weight is exact integer-derived
    * division, so scores AND the rank order they induce are
    * bitwise-identical to the oracle. Monotone in the same df, so
    * per-document ranking semantics match log-idf for fixed tf.
    *
    * Plan: one explode → (doc, term) tf aggregate; term df aggregate
    * reuses the same shuffle key; N is a 1-row broadcast; window top-k
    * per doc. All aggregates map-side combined — no shuffle carries
    * raw text. */
  def tfidf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .join(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * (col("n_docs") + 1).cast("double")
          / (col("df") + 1).cast("double"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TfidfTopK)
      .select(col("doc_id"), col("term"), col("rk"), col("tf"), col("df"),
        (round(col("score"), 4) + 0.0).as("score"))
  }

  def tfidf(spark: SparkSession, dir: String): DataFrame =
    tfidf(Tables.documents(spark, dir))

  val tfidfSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |    CAST(tf.tf AS DOUBLE) * CAST(n.n_docs + 1 AS DOUBLE) / CAST(df.df + 1 AS DOUBLE) AS score
       |  FROM tf JOIN df USING (term) CROSS JOIN n)
       |SELECT doc_id, term, rk, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       |  round(score, 4) + 0.0 AS score
       |FROM (
       |  SELECT doc_id, term, tf, df, score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
       |  FROM scored)
       |WHERE rk <= $TfidfTopK""".stripMargin

  // ---- #54 (q49) corpus heavy hitters ----

  val HeavyHittersK = 20

  /** Top-K corpus vocabulary: term frequency + document frequency for
    * the K most frequent tokens, deterministic (tf DESC, term) order.
    * One map-side-combined (term) aggregate — df via count(distinct
    * doc) per term, partially aggregated — then a global top-K that
    * Spark plans as TakeOrdered (per-partition heaps, no full sort
    * shuffle). The vocabulary profile every corpus-QA pass starts with. */
  def heavyHitters(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("term"))
      .limit(HeavyHittersK)
      // rank by VALUE over the K surviving rows: fold them into one
      // sorted array (struct order: -tf ascending = tf descending,
      // then term) and posexplode the position back out. No window —
      // so no WindowExec "No Partition Defined" warning drowning real
      // unpartitioned-window mistakes — and no reliance on the
      // physical row order of the limit output surviving planner
      // changes (a row-index rank breaks silently if sort+limit ever
      // stops delivering one ordered partition).
      .agg(sort_array(collect_list(struct(
        (-col("tf")).as("neg_tf"), col("term"), col("tf"), col("df")))).as("a"))
      .select(posexplode(col("a")).as(Seq("p", "s")))
      .select(col("s.term").as("term"), col("s.tf").as("tf"),
        col("s.df").as("df"), (col("p") + 1).cast("long").as("rank"))

  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    heavyHitters(Tables.documents(spark, dir))

  val heavyHittersSql: String =
    s"""SELECT term, tf, df, row_number() OVER (ORDER BY tf DESC, term) AS rank
       |FROM (
       |  SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
       |  GROUP BY term
       |  ORDER BY tf DESC, term
       |  LIMIT $HeavyHittersK)""".stripMargin

  // ---- #43 (q40) Gopher-style repetition filters ----

  /** Thresholds tuned so testdata exercises BOTH outcomes; the shape
    * (not the constants) is the public Gopher repetition-filter recipe
    * (Rae et al. 2021 §A1.1: duplicate-content and top-n-gram character
    * fractions gate a document out of the training corpus). */
  val MaxDupWordFrac = 0.55
  val MaxTopBigramCharFrac = 0.10
  val MaxTopTrigramCharFrac = 0.10

  /** Gopher-style repetition metrics per document: duplicate-word
    * fraction and the character fraction covered by the most frequent
    * word 2-gram / 3-gram, plus the keep/drop flag. Character fractions
    * are against non-space characters so the gram-internal separator
    * doesn't skew them.
    *
    * Plan shape: ONE scan + tokenization, one explode emitting all
    * three gram orders tagged with `n`, one map-side-combined
    * (doc, n, gram) count, one (doc, order) top-1 window, and ONE
    * final per-doc aggregate deriving every metric with conditional
    * expressions — base metrics from the unigram counts (n_words = Σc,
    * distinct = rows, non-space chars = Σ c·len), top-gram coverage
    * from the rk=1 rows of orders 2/3. No self-join, no second scan
    * (a two-branch formulation was measured to push the n=1 / n>1
    * filters through the aggregate into two separate full scans —
    * explain-audited back to this single-pass shape). */
  def gopherRepetition(docs: DataFrame): DataFrame =
    repetitionCore(docs.select(col("doc_id"), split(col("text"), " ").as("ws")))
      .select(col("doc_id"), col("n_words").cast("long").as("n_words"),
        col("dup_word_frac"), col("top2_char_frac"), col("top3_char_frac"),
        col("repetition_pass"))

  /** The gram-metric core shared by [[gopherRepetition]] and
    * [[Curation]]'s fused single-scan plan. `base` provides `doc_id` and
    * the token array `ws`; `carry` names doc-level columns of `base`
    * threaded through the explode on ONE sentinel (n=0) row per document
    * — so the gram-count shuffle pays their bytes once per doc (gram
    * rows carry nulls), not once per gram — and recovered in the per-doc
    * aggregate via `max` (null-ignoring). Output: per-doc repetition
    * metrics + repetition_pass + the carried columns. */
  private[graft] def repetitionCore(base: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emptyGrams = array().cast("array<struct<n:int,g:string>>")
    def gramsOf(nn: Int): Column =
      when(size(col("ws")) >= nn,
        transform(sequence(lit(1), size(col("ws")) - (nn - 1)), i =>
          struct(lit(nn).as("n"),
            concat_ws(" ", (0 until nn).map(j => element_at(col("ws"), i + j)): _*).as("g"))))
        .otherwise(emptyGrams)
    val gramArr =
      if (carry.isEmpty) concat(gramsOf(1), gramsOf(2), gramsOf(3))
      else concat(array(struct(lit(0).as("n"), lit("").as("g"))),
        gramsOf(1), gramsOf(2), gramsOf(3))
    val counts = base
      .select(col("doc_id") +: carry.map(col) :+ explode(gramArr).as("t"): _*)
      .select(col("doc_id") +: col("t").getField("n").as("n") +:
        col("t").getField("g").as("g") +:
        carry.map(c => when(col("t").getField("n") === 0, col(c)).as(c)): _*)
      .groupBy(col("doc_id"), col("n"), col("g"))
      .agg(count(lit(1)).as("c"), carry.map(c => max(col(c)).as(c)): _*)
    val w = Window.partitionBy(col("doc_id"), col("n")).orderBy(col("c").desc, col("g"))
    val topChars = col("c") * length(translate(col("g"), " ", ""))
    val aggs = Seq(
      sum(when(col("n") === 1, col("c"))).as("n_words"),
      sum(when(col("n") === 1, 1L)).as("n_distinct"),
      sum(when(col("n") === 1, col("c") * length(col("g")))).as("nsc"),
      max(when(col("n") === 2 && col("rk") === 1, topChars)).as("chars2"),
      max(when(col("n") === 3 && col("rk") === 1, topChars)).as("chars3")) ++
      carry.map(c => max(col(c)).as(c))
    val perDoc = counts
      .withColumn("rk", row_number().over(w))
      .groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val withDup = perDoc
      .select(col("doc_id") +: col("n_words") +: col("nsc") +: col("chars2") +:
        col("chars3") +:
        (round(lit(1.0) - col("n_distinct").cast("double")
          / col("n_words").cast("double"), 4) + 0.0).as("dup_word_frac") +:
        carry.map(col): _*)
    val frac2 = (round(coalesce(col("chars2"), lit(0L)).cast("double")
      / col("nsc").cast("double"), 4) + 0.0)
    val frac3 = (round(coalesce(col("chars3"), lit(0L)).cast("double")
      / col("nsc").cast("double"), 4) + 0.0)
    withDup
      .withColumn("top2_char_frac", frac2)
      .withColumn("top3_char_frac", frac3)
      .withColumn("repetition_pass",
        (col("dup_word_frac") <= MaxDupWordFrac &&
          col("top2_char_frac") <= MaxTopBigramCharFrac &&
          col("top3_char_frac") <= MaxTopTrigramCharFrac).cast("int"))
  }

  def gopherRepetition(spark: SparkSession, dir: String): DataFrame =
    gopherRepetition(Tables.documents(spark, dir))

  private def topGramSql(n: Int): String = {
    val parts = (0 until n).map(j => s"ws[i + $j]").mkString(" || ' ' || ")
    s"""g$n AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(ws) - ${n - 2}), i -> $parts)) AS g
       |  FROM w WHERE len(ws) >= $n),
       |c$n AS (SELECT doc_id, g, count(*) AS c FROM g$n GROUP BY 1, 2),
       |top$n AS (
       |  SELECT doc_id, c * length(replace(g, ' ', '')) AS chars$n
       |  FROM (SELECT doc_id, g, c,
       |          row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rk
       |        FROM c$n)
       |  WHERE rk = 1)""".stripMargin
  }

  val gopherRepetitionSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws,
       |    length(replace(text, ' ', '')) AS nsc
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, len(ws) AS n_words, nsc,
       |    round(1.0 - len(list_distinct(ws)) * 1.0 / len(ws), 4) + 0.0 AS dup_word_frac
       |  FROM w),
       |${topGramSql(2).replace("\n", " ")},
       |${topGramSql(3).replace("\n", " ")}
       |SELECT base.doc_id, CAST(n_words AS BIGINT) AS n_words, dup_word_frac,
       |  round(coalesce(chars2, 0) * 1.0 / nsc, 4) + 0.0 AS top2_char_frac,
       |  round(coalesce(chars3, 0) * 1.0 / nsc, 4) + 0.0 AS top3_char_frac,
       |  CAST(dup_word_frac <= $MaxDupWordFrac
       |    AND round(coalesce(chars2, 0) * 1.0 / nsc, 4) + 0.0 <= $MaxTopBigramCharFrac
       |    AND round(coalesce(chars3, 0) * 1.0 / nsc, 4) + 0.0 <= $MaxTopTrigramCharFrac
       |    AS INT) AS repetition_pass
       |FROM base
       |LEFT JOIN top2 ON base.doc_id = top2.doc_id
       |LEFT JOIN top3 ON base.doc_id = top3.doc_id""".stripMargin
}
