package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2 #30): media as opaque
  * `binary` payload columns with typed metadata, decoded per-partition.
  *
  * The container has no image/audio codecs, so [[decodePayload]] is a
  * DETERMINISTIC FAKE decoder (clearly marked): it derives metadata from
  * payload bytes instead of parsing a real container format. Everything
  * around it — the binary column, the case-class schema, the
  * `mapPartitions` batch shape, partitioning — is the real plumbing a
  * production decode (JNI codec, ONNX feature extractor) would drop
  * into.
  *
  * Scale: payloads stay in the executors end-to-end (no collect); decode
  * is `mapPartitions` so a real decoder amortizes per-partition init
  * (codec contexts, model sessions) across rows, mirroring how Python
  * pipelines batch via mapInPandas.
  */
object Multimodal {

  /** Typed media row: payload + metadata extracted from it. */
  case class MediaMeta(doc_id: Long, payload_len: Int, format: String, width: Int, height: Int)

  val Formats: Seq[String] = Seq("png", "jpg", "webp", "gif")

  /** Synthesize a binary payload column per document (md5 bytes of the
    * text — a stand-in for real image bytes; deterministic so the oracle
    * can recompute it). */
  def payloads(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), unhex(md5(col("text"))).as("payload"))

  def payloads(spark: SparkSession, dir: String): DataFrame =
    payloads(Tables.documents(spark, dir))

  /** STUB DECODER — deterministic fake standing in for a real codec.
    * Reads "metadata" straight out of payload bytes:
    * format ← high nibble of byte 0 mod 4; width/height ← bytes 1/2.
    * A real implementation would parse the container header here. */
  private def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val fmt = Formats(((payload(0) >> 4) & 0xF) % 4)
    MediaMeta(docId, payload.length, fmt,
      64 + (payload(1) & 0xFF), 64 + (payload(2) & 0xFF))
  }

  /** Per-partition typed decode: the production batch shape (iterator →
    * iterator, per-partition init amortized). */
  def decodePayload(payloadDf: DataFrame): Dataset[MediaMeta] = {
    val spark = payloadDf.sparkSession
    import spark.implicits._
    payloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real decoder would initialize its codec context here, once
        rows.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
  }

  /** #30 oracle query: the declarative twin of [[decodePayload]] —
    * identical metadata math expressed in Catalyst so DuckDB can verify
    * it (the mapPartitions path is asserted equal in MultimodalSpec). */
  def multimodalMeta(docs: DataFrame): DataFrame = {
    val h = md5(col("text"))
    val fmtIdx = conv(substring(h, 1, 1), 16, 10).cast("int") % 4
    docs.select(
      col("doc_id"),
      length(unhex(h)).as("payload_len"),
      element_at(typedLit(Formats), fmtIdx + 1).as("format"),
      (conv(substring(h, 3, 2), 16, 10).cast("int") + 64).as("width"),
      (conv(substring(h, 5, 2), 16, 10).cast("int") + 64).as("height"))
  }

  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    multimodalMeta(Tables.documents(spark, dir))

  val multimodalMetaSql: String = {
    val cases = Formats.zipWithIndex
      .map { case (f, i) => s"WHEN $i THEN '$f'" }.mkString(" ")
    s"""SELECT doc_id,
       |  octet_length(unhex(md5(text))) AS payload_len,
       |  CASE ('0x' || substr(md5(text), 1, 1))::INT % 4 $cases END AS format,
       |  ('0x' || substr(md5(text), 3, 2))::INT + 64 AS width,
       |  ('0x' || substr(md5(text), 5, 2))::INT + 64 AS height
       |FROM documents""".stripMargin
  }
}
