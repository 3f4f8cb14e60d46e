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
  * windows + an occurrence count, identical output semantics for a
  * fixed minimum span length.
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
  * Scale shape: one scan; window keys are 8-byte longs (not gram
  * strings — ~3× smaller shuffle than q40's order-tagged grams, and no
  * tie-break semantics here to preserve); exactly two exchanges — one
  * by gram key for the global occurrence count, one by doc for the
  * island merge (the final aggregate reuses the island window's
  * partitioning). A pathologically hot key (site boilerplate repeated
  * 1e8×) lands its positions in one partition for the count window —
  * if profiling ever shows that wall, swap the count window for a
  * two-level groupBy (key → count, broadcast df≥2 keys) at the price
  * of a second pass over gram rows; the output is identical.
  */
object Spans {

  /** Minimum duplicated span length, in whitespace tokens. Lee et al.
    * use 50 BPE tokens; 8 words ≈ the same order of text and suits the
    * synthetic corpus's short documents. */
  val SpanTokens = 8

  /** q62: (doc_id, start_tok, end_tok, n_windows) — maximal duplicated
    * spans; token positions are 1-based inclusive. */
  def dupSpans(docs: DataFrame): DataFrame = {
    val L = SpanTokens
    val grams = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= L)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), size(col("w")) - lit(L - 1)),
          i => Hashing.hash48(concat_ws(" ", slice(col("w"), i, lit(L)))))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("k"))
    val occ = Window.partitionBy(col("k"))
    val island = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    grams
      .withColumn("n_occ", count(lit(1)).over(occ))
      .filter(col("n_occ") >= 2)
      .withColumn("grp", col("pos") - row_number().over(island))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("start_tok"),
        (max(col("pos")) + lit(L - 1)).as("end_tok"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("start_tok"), col("end_tok"), col("n_windows"))
  }

  def dupSpans(spark: SparkSession, dir: String): DataFrame =
    dupSpans(Tables.documents(spark, dir))

  /** DuckDB twin: same windows, same hash48 keys, same island rule. */
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
}
