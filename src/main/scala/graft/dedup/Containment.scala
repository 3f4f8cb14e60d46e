package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Shingle CONTAINMENT join — the asymmetric near-dup q22's Jaccard
  * structurally cannot see: a 50-shingle quote pasted into a
  * 5000-shingle page has J ≈ 0.01 (invisible at any usable Jaccard
  * threshold) but containment C(A→B) = |S_A ∩ S_B| / |S_A| = 1.0.
  * This is the "excerpt / quotation / wrapper page" detector a
  * curation pipeline needs BESIDE symmetric near-dup — the classic
  * miss when training corpora embed licensed or benchmark text inside
  * larger documents.
  *
  * Candidate generation is NEVER all-pairs: C ≥ t forces A to share at
  * least one of its n_A − ⌈t·n_A⌉ + 1 globally-RAREST shingles
  * (prefix filter on the CONTAINED side — same rarity order as q22's
  * PPJoin), and |S_B| ≥ ⌈t·n_A⌉ (length filter); both are LOSSLESS,
  * which the oracle proves directly — the DuckDB twin is the plain
  * all-pairs intersection join, and the gate asserts set equality.
  * The contained side's prefix keeps only rarest shingles, so hot
  * boilerplate shingles contribute candidates only through documents
  * small enough that they ARE mostly boilerplate — the damage the
  * operator exists to flag.
  *
  * Exactness: counts are integers end to end; the one ratio rounds at
  * display (round 4, both engines). */
object Containment {

  /** C(A→B) threshold: A counts as contained when half its shingles
    * appear in B. */
  val Threshold = 0.5
  /** Contained docs need this many distinct shingles to score (a
    * 2-shingle snippet "contained" anywhere is noise). */
  val MinShingles = 5L

  /** Directional containment pairs (doc_a contained-in doc_b) over a
    * documents frame with (doc_id, text). Returns
    * (doc_a, doc_b, na, n_inter, containment). */
  def containmentPairs(docs: DataFrame): DataFrame = {
    // the distinct is an exchange barrier, but the r14 pair-count
    // rewrite made this frame FOUR consumers wide (dfreq, ranked,
    // shA, shB) and ReusedExchange does not cover the whole fan-out —
    // unpinned, the md5 shingle pipeline re-ran per consumer
    // (measured 7.4 s → 4.6 s at sf0.1 from this one checkpoint)
    val sh = Dedup.docShingles(docs).distinct().localCheckpoint(true)
    val dfreq = sh.groupBy(col("shk")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id"))
    // ranked feeds THREE consumers (prefixA, fullB, suffA) — same
    // re-run hazard as sh above, so it gets the same pin
    val ranked = sh.join(dfreq, "shk")
      .withColumn("n_sh", count(lit(1)).over(wDoc))
      .withColumn("pos",
        row_number().over(wDoc.orderBy(col("df"), col("shk"))))
      .localCheckpoint(true)
    // Per-doc prefix length: the na − ⌈t·na⌉ + 1 globally-RAREST
    // shingles. Everything below leans on one structural fact: every
    // doc ranks its shingles in the SAME global (df, shk) order, so
    // "prefix" and "suffix" are globally comparable across docs — all
    // of A's suffix shingles are globally GREATER than all of A's
    // prefix shingles, and any B shingle greater than another has the
    // larger B-position.
    val prefixLen = col("n_sh") - ceil(col("n_sh") * Threshold) + 1
    val prefixA = ranked
      .filter(col("n_sh") >= MinShingles)
      .filter(col("pos") <= prefixLen)
      .select(col("doc_id"), col("shk"), col("n_sh"), col("pos"))
    val fullB = ranked
      .select(col("doc_id"), col("shk"), col("n_sh"), col("pos"))
    // Candidate pairs + EXACT prefix-intersection count in one pass
    // (r14 verdict #1). Each join row is one distinct shared shingle
    // lying in A's prefix, so cnt_p = |prefix(A) ∩ B| exactly — which
    // means the expensive count join below only has to count SUFFIX
    // matches (≈ ⌈t·na⌉ − 1 rows per doc instead of na: halves the
    // pair×shingle stream).
    //
    // Two LOSSLESS pair prunes before that stream exists (both
    // oracle-checked against the all-pairs DuckDB twin):
    //  1. PPJoin positional bound (q22's PrefixJaccard argument): the
    //     globally-smallest shared shingle s1 is the earliest shared on
    //     BOTH sides at once; overlap ≤ 1 + min(na − pa, nb − pb) with
    //     pa/pb = s1's positions = min over matched rows. A qualifying
    //     pair (overlap ≥ ⌈t·na⌉) has s1 inside A's prefix
    //     (pigeonhole), so its pa/pb are recovered exactly and the
    //     bound ≥ the true overlap — never pruned.
    //  2. A suffix-count bound (cnt_p + min(⌈t·na⌉−1, nb − max(b.pos))
    //     ≥ ⌈t·na⌉) was ALSO measured here and pruned <1% at t = 0.5
    //     (659711 → 654443 pairs at sf0.1) — dropped as not worth its
    //     aggregate buffers.
    val need = ceil(col("na") * Threshold)
    val cand = prefixA.as("a")
      .join(fullB.as("b"), col("a.shk") === col("b.shk")
        && col("a.doc_id") =!= col("b.doc_id")
        && col("b.n_sh") >= ceil(col("a.n_sh") * Threshold))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(first(col("a.n_sh")).as("na"), first(col("b.n_sh")).as("nb"),
        min(col("a.pos")).as("pa"), min(col("b.pos")).as("pb"),
        count(lit(1)).as("cnt_p"))
      .filter(lit(1) + least(col("na") - col("pa"), col("nb") - col("pb"))
        >= need)
      .select(col("doc_a"), col("doc_b"), col("na"), col("cnt_p"))
      // cand feeds the suffix-count probe AND the union below —
      // unpinned, the whole prefix×full candidate join re-runs twice
      .localCheckpoint(true)
    // Remaining intersection size as a pair-join COUNT (r13 verdict
    // #5) — but over A's SUFFIX only, since cnt_p already counts the
    // prefix matches exactly. Everything stays row-shaped at ANY
    // document size — the collect_list/array_intersect form held two
    // full shingle arrays in memory per pair row, a per-document-length
    // memory term this plan removes.
    // shuffle_hash on BOTH probe joins: the shingle frame is
    // corpus-sized, so broadcasting it is exactly the fragile-bcast
    // shape the doc audit flags (dies at 1000×); and even at sf0.1
    // the partitioned probes beat the broadcast plan (measured
    // 7.9 s → 5.0 s — the pair×shingle stream shuffles for the
    // groupBy anyway, so partition-aligned probes are free).
    // UNION instead of joining a suffix-count frame back to cand: each
    // matched suffix shingle contributes (pair, cnt=1, na=null) and
    // cand itself contributes (pair, cnt=cnt_p, na) — one aggregate
    // sums them into the exact n_inter, keeps every pair (including
    // those whose whole intersection lives in A's prefix), and
    // recovers na via max, replacing a join + an extra shuffle of the
    // pair frame.
    val suffA = ranked.filter(col("pos") > prefixLen)
      .select(col("doc_id").as("doc_a"), col("shk"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("shk"))
    val suffRows = cand.select(col("doc_a"), col("doc_b"))
      .join(suffA.hint("shuffle_hash"), "doc_a")
      .join(shB.hint("shuffle_hash"), Seq("doc_b", "shk"))
      .select(col("doc_a"), col("doc_b"),
        lit(null).cast("bigint").as("na"), lit(1L).as("cnt"))
    val candRows = cand
      .select(col("doc_a"), col("doc_b"), col("na"), col("cnt_p").as("cnt"))
    suffRows.union(candRows)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("na")).as("na"), sum(col("cnt")).as("n_inter"))
      .withColumn("containment",
        col("n_inter").cast("double") / col("na").cast("double"))
      .filter(col("containment") >= Threshold)
      .select(col("doc_a"), col("doc_b"), col("na"), col("n_inter"),
        (round(col("containment"), 4) + 0.0).as("containment"))
  }

  def containmentPairs(spark: SparkSession, dir: String): DataFrame =
    containmentPairs(Tables.documents(spark, dir))

  /** DuckDB twin: the PLAIN all-pairs intersection join — the prefix
    * and length filters must be invisible in the result (losslessness
    * is part of what the gate checks). */
  val containmentPairsSql: String =
    s"""WITH ${Dedup.docShingleHashesSql},
       |counts AS (SELECT doc_id, count(*) AS n_sh FROM shk GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(count(*) AS BIGINT) AS n_inter
       |  FROM shk a JOIN shk b ON a.shk = b.shk AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, CAST(ca.n_sh AS BIGINT) AS na, n_inter,
       |  round(n_inter * 1.0 / ca.n_sh, 4) + 0.0 AS containment
       |FROM inter
       |JOIN counts ca ON doc_a = ca.doc_id
       |WHERE ca.n_sh >= ${MinShingles}
       |  AND n_inter * 1.0 / ca.n_sh >= $Threshold""".stripMargin
}
