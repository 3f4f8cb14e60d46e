package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Incremental dedup: triage an INCOMING batch of documents against an
  * already-ingested corpus — the shape every continuously-fed training
  * pipeline runs on each delivery, instead of re-deduping the whole
  * corpus. Each batch doc resolves to:
  *   - `exact` — byte-identical to a corpus doc (md5 equi-join);
  *   - `near`  — shares a MinHash LSH band bucket with a corpus doc;
  *   - `new`   — neither; safe to ingest.
  * `matched_id` carries the smallest matching corpus doc (exact match
  * wins over near match).
  *
  * Scale shape: both probes are equi-joins on small keys (32-hex md5 /
  * 16-byte band key) against an index the pipeline would precompute and
  * keep partitioned by key; the batch side is the small delivery, so at
  * 100 TB these are broadcast or bucket-local joins — never a scan-x-scan.
  * Signatures are the same pure projection the full-corpus dedup uses
  * ([[Dedup.bandedSignatures]]), so the incremental path and the batch
  * path cannot disagree on what "near" means.
  *
  * The registered query treats doc_id % 10 == 0 as the incoming batch.
  */
object Incremental {

  val BatchMod = 10

  def incrementalDedup(docs: DataFrame): DataFrame = {
    val batch = docs.filter(col("doc_id") % BatchMod === 0)
    val corpus = docs.filter(col("doc_id") % BatchMod =!= 0)
    val exact = batch.select(col("doc_id"), md5(col("text")).as("h"))
      .join(corpus.select(md5(col("text")).as("h"), col("doc_id").as("cid")), "h")
      .groupBy("doc_id").agg(min("cid").as("exact_id"))
    val near = Dedup.bandedSignatures(batch)
      .join(
        Dedup.bandedSignatures(corpus)
          .withColumnRenamed("doc_id", "cid"),
        Seq("band", "band_key"))
      .groupBy("doc_id").agg(min("cid").as("near_id"))
    batch.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_id").isNotNull, "exact")
          .when(col("near_id").isNotNull, "near")
          .otherwise("new").as("match_type"),
        coalesce(col("exact_id"), col("near_id")).as("matched_id"))
  }

  def incrementalDedup(spark: SparkSession, dir: String): DataFrame =
    incrementalDedup(Tables.documents(spark, dir))

  /** DuckDB twin over the shared band-bucket CTEs
    * ([[Dedup.bucketsCtesSql]]); sides split by the same modulus. */
  val incrementalDedupSql: String =
    s"""WITH ${Dedup.bucketsCtesSql.replace("\n", " ")},
       |exact AS (
       |  SELECT b.doc_id, min(c.doc_id) AS exact_id
       |  FROM (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % $BatchMod = 0) b
       |  JOIN (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % $BatchMod <> 0) c
       |    USING (h)
       |  GROUP BY 1),
       |near AS (
       |  SELECT b.doc_id, min(c.doc_id) AS near_id
       |  FROM buckets b JOIN buckets c
       |    ON b.band = c.band AND b.band_key = c.band_key
       |   AND b.doc_id % $BatchMod = 0 AND c.doc_id % $BatchMod <> 0
       |  GROUP BY 1)
       |SELECT d.doc_id,
       |  CASE WHEN e.exact_id IS NOT NULL THEN 'exact'
       |       WHEN n.near_id IS NOT NULL THEN 'near'
       |       ELSE 'new' END AS match_type,
       |  coalesce(e.exact_id, n.near_id) AS matched_id
       |FROM (SELECT doc_id FROM documents WHERE doc_id % $BatchMod = 0) d
       |LEFT JOIN exact e ON d.doc_id = e.doc_id
       |LEFT JOIN near n ON d.doc_id = n.doc_id""".stripMargin
}
