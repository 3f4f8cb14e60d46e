package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Substring-level (span) dedup — the rung of the dedup ladder between
  * document-exact (q19) and document-near (q20/q22): find every
  * maximal token span of length ≥ [[SpanTokens]] that occurs MORE THAN
  * ONCE corpus-wide, within or across documents. This is the
  * "deduplicate repeated substrings" pass of Lee et al. 2021
  * (arXiv:2107.06499), which removes boilerplate/licenses/templates
  * that document-level dedup cannot see; their ExactSubstr uses a
  * suffix array, which is the right single-machine structure but not a
  * shuffle-friendly one — the distributed re-expression is rolling
  * windows + an occurrence count. Output semantics: each reported span
  * is the UNION COVERAGE of consecutive duplicated L-windows — every
  * L-window inside it occurs ≥ 2 times corpus-wide, but adjacent
  * windows may owe their duplication to different sources, so a
  * reported maximal span need not itself occur twice verbatim. (For a
  * fixed minimum length this is the same set of removable text as
  * ExactSubstr's overlapping-match union.)
  *
  * Method: every [[SpanTokens]]-token window is keyed by
  * hash48(window); a window is `dup` iff its key occurs ≥ 2 times
  * globally; per document, consecutive dup window STARTS merge into
  * maximal islands (start − row_number is constant on an island — the
  * gaps-and-islands identity), reported as token spans
  * `[start_tok, end_tok]` with the window count. A document duplicated
  * verbatim yields one island covering it entirely.
  *
  * Exactness: positions and counts are integers; the gram key is the
  * same hash48 recipe on both engines, so even the 2^-48 collision
  * events are REPRODUCED identically by the oracle rather than
  * tolerated. Docs shorter than one window are filtered on both sides.
  *
  * Scale shape: window keys are 8-byte longs (not gram strings — ~3×
  * smaller shuffle than q40's order-tagged grams, and no tie-break
  * semantics here to preserve). The global occurrence count is a
  * map-side-combined `groupBy(k).count()` + left-semi join of the
  * `n_occ ≥ 2` keys back onto the gram stream — NOT a
  * `count() OVER (PARTITION BY k)` window: a pathologically hot key
  * (site boilerplate repeated 1e8×) would land every position in ONE
  * window-partition task, whereas the groupBy partial-aggregates it to
  * one row per input partition and the semi join is AQE
  * skew-splittable. The price is a second pass over gram generation
  * (both semi-join sides derive from the same scan) — the right trade,
  * since grams at corpus scale are too large to cache. One exchange by
  * doc for the island merge (the final aggregate reuses the island
  * window's partitioning).
  */
object Spans {

  /** Minimum duplicated span length, in whitespace tokens. Lee et al.
    * use 50 BPE tokens; 8 words ≈ the same order of text and suits the
    * synthetic corpus's short documents. */
  val SpanTokens = 8

  /** (doc_id, pos, k): every L-token window start with its hash48 key;
    * pos is 1-based. Shared by [[dupSpans]] and [[removeDupSpans]]. */
  private def windowKeys(docs: DataFrame): DataFrame = {
    val L = SpanTokens
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= L)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), size(col("w")) - lit(L - 1)),
          i => Hashing.hash48(concat_ws(" ", slice(col("w"), i, lit(L)))))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("k"))
  }

  /** q62: (doc_id, start_tok, end_tok, n_windows) — maximal duplicated
    * spans; token positions are 1-based inclusive. */
  def dupSpans(docs: DataFrame): DataFrame = {
    val L = SpanTokens
    val grams = windowKeys(docs)
    // skew-safe global count: partial aggregation collapses a hot key
    // to one row per input partition before the exchange
    val dupKeys = grams.groupBy("k").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
      .select("k")
    val island = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    grams.join(dupKeys, Seq("k"), "left_semi")
      .withColumn("grp", col("pos") - row_number().over(island))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("start_tok"),
        (max(col("pos")) + lit(L - 1)).as("end_tok"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("start_tok"), col("end_tok"), col("n_windows"))
  }

  def dupSpans(spark: SparkSession, dir: String): DataFrame =
    dupSpans(Tables.documents(spark, dir))

  /** DuckDB twin: same windows, same hash48 keys, same island rule.
    * (The oracle may use a per-key window — single-node, no skew
    * concern; output is identical to the groupBy+semi-join plan.) */
  val dupSpansSql: String = {
    val L = SpanTokens
    val gramHash = Hashing.hash48Sql(s"array_to_string(w[i : i + ${L - 1}], ' ')")
    s"""WITH ws AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |grams AS (
       |  SELECT doc_id, i AS pos, $gramHash AS k
       |  FROM ws, unnest(generate_series(1, greatest(len(w) - ${L - 1}, 0))) AS t(i)
       |  WHERE len(w) >= $L),
       |dup AS (
       |  SELECT doc_id, pos FROM (
       |    SELECT doc_id, pos, count(*) OVER (PARTITION BY k) AS n_occ FROM grams)
       |  WHERE n_occ >= 2),
       |islands AS (
       |  SELECT doc_id, pos,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM dup)
       |SELECT doc_id, min(pos) AS start_tok, max(pos) + ${L - 1} AS end_tok,
       |  count(*) AS n_windows
       |FROM islands GROUP BY doc_id, grp""".stripMargin
  }

  // ---- q63: span REMOVAL — the transform Lee et al. actually apply ----

  /** q63: excise duplicated spans, keeping the globally-FIRST
    * occurrence of each duplicated window. Lee et al. cut the repeated
    * substrings out of the corpus, they don't just report them — this
    * completes the substring rung the way q19 (report) / q39 (cluster)
    * complete the document rung.
    *
    * Policy: for each duplicated window key, the occurrence with the
    * lexicographically smallest `(doc_id, pos)` is the canonical copy
    * and is KEPT; every other occurrence's L tokens are removable. A
    * token is excised iff some removable window covers it (union
    * coverage — overlapping removable windows merge naturally). The
    * canonical copy itself survives only where no OTHER removable
    * window overlaps it, which mirrors ExactSubstr's cut-all-but-one
    * behavior on overlapping match sets.
    *
    * Output: (doc_id, n_tokens, n_removed, clean_text) for EVERY
    * document — n_tokens the original whitespace token count,
    * n_removed how many tokens were excised, clean_text the surviving
    * tokens joined by single spaces (original order).
    *
    * Scale shape: the first-occurrence election is a map-side-combined
    * `min(struct(doc_id, pos))` per key — the skew-safe form of
    * `row_number() = 1` (a hot key partial-aggregates to one row per
    * partition instead of sorting 1e8 positions in one task). The join
    * of grams back to their key's winner is AQE skew-splittable. The
    * L× explode of removable windows into covered token positions
    * touches only the duplicated fraction of the corpus, and the final
    * per-document assembly is one hash aggregate whose collect_list
    * holds a single document's tokens — the same per-doc memory bound
    * as q57 chunking. */
  def removeDupSpans(docs: DataFrame): DataFrame = {
    val L = SpanTokens
    val ws = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
    val grams = windowKeys(docs)
    // lexicographic min over (doc_id, pos) per key — struct min is
    // field-ordered, so this IS "first by doc_id, then by pos"
    val firsts = grams.groupBy("k")
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"))
      .select(col("k"), col("f.doc_id").as("fdoc"), col("f.pos").as("fpos"))
    val removable = grams.join(firsts, "k")
      .filter(!(col("doc_id") === col("fdoc") && col("pos") === col("fpos")))
      .select(col("doc_id"), col("pos"))
    val covered = removable
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(L - 1))).as("tpos"))
      .distinct()
      .withColumn("rm", lit(1))
    val toks = ws.select(col("doc_id"), posexplode(col("w")))
      .select(col("doc_id"), (col("pos") + 1).as("tpos"), col("col").as("word"))
    toks.join(covered, Seq("doc_id", "tpos"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(col("rm")).as("n_removed"),
        array_join(transform(array_sort(collect_list(
          when(col("rm").isNull, struct(col("tpos"), col("word"))))),
          x => x.getField("word")), " ").as("clean_text"))
  }

  def removeDupSpans(spark: SparkSession, dir: String): DataFrame =
    removeDupSpans(Tables.documents(spark, dir))

  /** DuckDB twin: identical window keys; first occurrence via
    * `row_number() OVER (PARTITION BY k ORDER BY doc_id, pos) = 1`,
    * which equals the Spark side's lexicographic struct-min. */
  val removeDupSpansSql: String = {
    val L = SpanTokens
    val gramHash = Hashing.hash48Sql(s"array_to_string(w[i : i + ${L - 1}], ' ')")
    s"""WITH ws AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |grams AS (
       |  SELECT doc_id, i AS pos, $gramHash AS k
       |  FROM ws, unnest(generate_series(1, greatest(len(w) - ${L - 1}, 0))) AS t(i)
       |  WHERE len(w) >= $L),
       |removable AS (
       |  SELECT doc_id, pos FROM (
       |    SELECT doc_id, pos,
       |      row_number() OVER (PARTITION BY k ORDER BY doc_id, pos) AS rn
       |    FROM grams)
       |  WHERE rn > 1),
       |covered AS (
       |  SELECT DISTINCT doc_id, pos + j AS tpos
       |  FROM removable, unnest(generate_series(0, ${L - 1})) AS t(j)),
       |toks AS (
       |  SELECT doc_id, generate_subscripts(w, 1) AS tpos, unnest(w) AS word
       |  FROM ws)
       |SELECT t.doc_id,
       |  count(*) AS n_tokens,
       |  count(c.tpos) AS n_removed,
       |  coalesce(array_to_string(
       |    list(t.word ORDER BY t.tpos) FILTER (WHERE c.tpos IS NULL), ' '),
       |    '') AS clean_text
       |FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.tpos = c.tpos
       |GROUP BY t.doc_id""".stripMargin
  }
}
