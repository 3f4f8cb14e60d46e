package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** PPJoin-style prefix-filtered exact Jaccard self-join — the registered
  * q22 path, and the reason the operator survives hot shingles at scale.
  *
  * Candidate pairs are generated only from each document's
  * n − ⌈t·n⌉ + 1 globally-RAREST shingles (prefix filter) plus a length
  * filter |B| ∈ [t·|A|, |A|/t]; both filters are lossless for J ≥ t, so
  * results are IDENTICAL to the plain inverted-index join
  * ([[Dedup.ngramJaccard]], which doubles as the DuckDB oracle twin —
  * asserted in DedupSpec). The hot-shingle guard falls out of the
  * rarity ordering: a boilerplate shingle shared by 10⁶ documents sorts
  * LAST within every document, lands outside every prefix (for any doc
  * with ≥ 2 shingles at t = 0.6), and therefore contributes ZERO
  * candidate pairs — the df² posting-list blowup of the plain join
  * cannot happen here (planted-hot-shingle bound asserted in DedupSpec).
  *
  * Intersection counting joins the (deduped, tiny) candidate pairs back
  * to per-doc sorted shingle arrays and takes `array_intersect` size —
  * two hash joins on doc_id carrying one array per doc, instead of
  * re-exploding both posting lists through a pair-keyed aggregation.
  */
object PrefixJaccard {
  import Dedup.{JaccardThreshold => T}

  /** Distinct (doc_id, shk) pairs: the shared working set.
    *
    * NOTE (measured, do not "simplify"): deriving this from a per-doc
    * `array_distinct` PROJECTION instead looks cheaper (no distinct
    * shuffle) but is the SURVEY §5 inlining trap — without an aggregate
    * barrier Catalyst pushes the array projection past the candidate
    * joins and recomputes the whole shingle pipeline per candidate PAIR
    * (measured 50s vs 2.2s at sf0.1). The distinct/groupBy shuffles ARE
    * the materialization barriers. */
  private def distinctShingles(docs: DataFrame): DataFrame =
    Dedup.docShingles(docs).distinct()

  /** Lossless candidate pairs (doc_a, doc_b, na, nb): prefix filter on
    * global-rarity order + length filter + PPJoin positional bound.
    * Exposed for the DedupSpec hot-shingle bound — candidate count is
    * THE scale metric here.
    *
    * Positional bound: all shingles sort in ONE global (df, shk) order,
    * so the first shingle a pair shares sits at the minimal prefix
    * position on BOTH sides simultaneously — overlap is then at most
    * 1 + min(na − pa, nb − pb) (that shingle plus everything after it
    * on the shorter remainder). J ≥ t needs overlap ≥ t/(1+t)·(na+nb);
    * pairs whose bound can't reach it are dropped BEFORE the
    * intersection join. Strictly lossless — if the bound fails,
    * J < t is certain. */
  private[graft] def candidates(sh: DataFrame): DataFrame = {
    val dfreq = sh.groupBy(col("shk")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id"))
    val ranked = sh.join(dfreq, "shk")
      .withColumn("n_sh", count(lit(1)).over(wDoc))
      .withColumn("pos", row_number().over(wDoc.orderBy(col("df"), col("shk"))))
    // prefix filter: J >= t pairs must share a shingle within the first
    // n - ceil(t*n) + 1 rarest shingles of each side (global rarity order)
    val prefix = ranked
      .filter(col("pos") <= col("n_sh") - ceil(col("n_sh") * T) + 1)
      .select(col("doc_id"), col("shk"), col("n_sh"), col("pos"))
    prefix.as("a")
      .join(prefix.as("b"), col("a.shk") === col("b.shk")
        && col("a.doc_id") < col("b.doc_id")
        // length filter: |B| in [t|A|, |A|/t] is necessary for J >= t
        && col("b.n_sh") >= ceil(col("a.n_sh") * T)
        && col("a.n_sh") >= ceil(col("b.n_sh") * T))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(first(col("a.n_sh")).as("na"), first(col("b.n_sh")).as("nb"),
        min(col("a.pos")).as("pa"), min(col("b.pos")).as("pb"))
      .filter(lit(1.0) + least(col("na") - col("pa"), col("nb") - col("pb"))
        >= lit(T / (1.0 + T)) * (col("na") + col("nb")))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"))
  }

  def ngramJaccardPrefix(docs: DataFrame): DataFrame = {
    val sh = distinctShingles(docs)
    val cand = candidates(sh)
    val docSets = sh.groupBy(col("doc_id"))
      .agg(collect_list(col("shk")).as("ss"))
    cand
      .join(docSets.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(docSets.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("n_inter", size(array_intersect(col("sa.ss"), col("sb.ss"))))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("na") + col("nb") - col("n_inter")))
      .filter(col("jaccard") >= T)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  def ngramJaccardPrefix(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPrefix(Tables.documents(spark, dir))
}
