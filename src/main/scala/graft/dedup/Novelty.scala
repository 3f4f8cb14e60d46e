package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cross-snapshot n-gram NOVELTY rate — the training-data freshness
  * metric: of the shingles in today's snapshot, what fraction was
  * never seen in the base snapshot? The roll-forward companion to the
  * dedup deck: q46 dedups the new snapshot against the old at
  * DOCUMENT grain, q42 probes for benchmark leakage; this measures at
  * SHINGLE grain how much genuinely new text a refresh adds — the
  * number that decides whether a recrawl is worth a training run.
  *
  * Both sides reuse the q20/q29 rolling-hash shingle machinery
  * verbatim ([[Dedup.docShingles]] — md5-per-token, arithmetic 3-gram
  * keys), so "seen" means the same thing here as in every dedup
  * operator. The snapshot split is the q73 convention (doc_id parity
  * stands in for the two crawl dates the synthetic corpus lacks).
  *
  * Plan/scale: one scan → shingle explode → one distinct per
  * (snapshot, key) → one anti-join of distinct key sets → two
  * counts. At 100 TB the base side's distinct set is the cost — swap
  * the anti-join for the q59 bloom probe (documented knob) when an
  * approximate rate suffices. */
object Novelty {

  /** q274: shingle novelty of the odd-doc snapshot vs the even-doc
    * base. One row: (n_base, n_new, n_novel, novelty_rate). */
  def snapshotNovelty(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.docShingles(Tables.documents(spark, dir))
      .selectExpr(
        "CASE WHEN doc_id % 2 = 0 THEN 'base' ELSE 'new' END AS snap",
        "shk")
      .distinct().localCheckpoint(true)
    val base = sh.filter(col("snap") === "base").select("shk")
    val fresh = sh.filter(col("snap") === "new").select("shk")
    val novel = fresh.join(base, Seq("shk"), "left_anti")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_novel"))
    val nb = base.agg(expr("CAST(count(1) AS BIGINT)").as("n_base"))
    val nn = fresh.agg(expr("CAST(count(1) AS BIGINT)").as("n_new"))
    nb.crossJoin(nn).crossJoin(novel)
      .selectExpr("n_base", "n_new", "n_novel",
        "round(CAST(n_novel AS DOUBLE) / nullif(CAST(n_new AS DOUBLE), 0e0), 6)" +
          " + 0.0 AS novelty_rate")
  }

  /** DuckDB twin: the shared shingle CTEs, NOT EXISTS as the
    * anti-join, identical rate text. */
  val snapshotNoveltySql: String =
    s"""WITH ${Dedup.docShinglesSql},
       |snap AS (
       |  SELECT DISTINCT
       |    CASE WHEN doc_id % 2 = 0 THEN 'base' ELSE 'new' END AS snap, shk
       |  FROM sh),
       |b AS (SELECT shk FROM snap WHERE snap = 'base'),
       |f AS (SELECT shk FROM snap WHERE snap = 'new'),
       |novel AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_novel
       |  FROM f WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.shk = f.shk)),
       |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_base FROM b),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_new FROM f)
       |SELECT n_base, n_new, n_novel,
       |  round(CAST(n_novel AS DOUBLE) / nullif(CAST(n_new AS DOUBLE), 0e0), 6)
       |    + 0.0 AS novelty_rate
       |FROM nb, nn, novel""".stripMargin
}
