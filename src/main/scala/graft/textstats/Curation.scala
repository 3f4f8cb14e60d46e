package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** End-to-end corpus curation — the composed keep/drop decision a
  * training-data pipeline actually ships: exact-dup canonicalization
  * ([[graft.dedup.Dedup.dedupExact]]), Gopher repetition filters
  * ([[TextStats.gopherRepetition]]), and the quality score
  * ([[TextStats.quality]]) joined into one verdict per document with
  * the first failing stage as the drop reason (dup > repetition >
  * quality — the conventional order: cheap exact checks first).
  *
  * This is deliberately a COMPOSITION of the already-verified
  * operators, not a re-implementation — the oracle nests the same
  * component SQL the individual queries hash-match, so q52 also guards
  * against the components drifting apart.
  *
  * Scale shape: three already-scale-audited subplans joined on doc_id
  * (each shuffle-partitioned on the same key), plus one md5 equi-join
  * for canonical resolution. No new shuffle classes beyond what the
  * components already pay.
  */
object Curation {

  val MinQuality = 0.55

  def curate(docs: DataFrame): DataFrame = {
    val canon = docs
      .select(col("doc_id"), md5(col("text")).as("text_hash"))
      .join(Dedup.dedupExact(docs).select(col("text_hash"), col("canonical_id")),
        "text_hash")
      .select(col("doc_id"), col("canonical_id"))
    val rep = TextStats.gopherRepetition(docs)
      .select(col("doc_id"), col("repetition_pass"))
    val qual = TextStats.quality(docs)
      .select(col("doc_id"), col("quality_score"))
    canon
      .join(rep, "doc_id")
      .join(qual, "doc_id")
      .withColumn("drop_reason",
        when(col("doc_id") =!= col("canonical_id"), "dup")
          .when(col("repetition_pass") === 0, "repetition")
          .when(col("quality_score") < MinQuality, "quality"))
      .withColumn("keep", col("drop_reason").isNull.cast("int"))
      .select(col("doc_id"), col("keep"), col("drop_reason"),
        col("canonical_id"), col("quality_score"))
  }

  def curate(spark: SparkSession, dir: String): DataFrame =
    curate(Tables.documents(spark, dir))

  /** DuckDB twin: nests the SAME component oracles (exact-dup,
    * repetition, quality) as subqueries and applies the identical
    * verdict chain. */
  val curateSql: String =
    s"""WITH canon AS (
       |  SELECT d.doc_id, e.canonical_id
       |  FROM (SELECT doc_id, md5(text) AS text_hash FROM documents) d
       |  JOIN (SELECT * FROM (${Dedup.dedupExactSql.replace("\n", " ")})) e
       |    USING (text_hash)),
       |rep AS (
       |  SELECT doc_id, repetition_pass
       |  FROM (${TextStats.gopherRepetitionSql.replace("\n", " ")})),
       |qual AS (
       |  SELECT doc_id, quality_score
       |  FROM (${TextStats.qualitySql.replace("\n", " ")})),
       |verdict AS (
       |  SELECT canon.doc_id, canon.canonical_id, rep.repetition_pass, qual.quality_score,
       |    CASE WHEN canon.doc_id <> canon.canonical_id THEN 'dup'
       |         WHEN rep.repetition_pass = 0 THEN 'repetition'
       |         WHEN qual.quality_score < $MinQuality THEN 'quality'
       |    END AS drop_reason
       |  FROM canon JOIN rep USING (doc_id) JOIN qual USING (doc_id))
       |SELECT doc_id, CAST(drop_reason IS NULL AS INT) AS keep, drop_reason,
       |  canonical_id, quality_score
       |FROM verdict""".stripMargin
}
