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

  /** Typed media feature row: payload → dense embedding. */
  case class MediaFeatures(doc_id: Long, embedding: Array[Float])

  /** STUB FEATURE EXTRACTOR — stands in for an ONNX/vision model: a
    * deterministic `FeatureDim`-dim embedding derived from payload
    * bytes. The Spark plumbing is the production shape: per-partition
    * "model session" init amortized across rows, fixed-dim float array
    * column out, directly consumable by [[graft.ann.Ann]]. */
  val FeatureDim = 16
  def extractFeatures(payloadDf: DataFrame): Dataset[MediaFeatures] = {
    val spark = payloadDf.sparkSession
    import spark.implicits._
    payloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: load the ONNX session ONCE per partition here
        rows.map { case (id, bytes) =>
          val emb = Array.tabulate(FeatureDim) { d =>
            // fake forward pass: byte mix, deterministic per (payload, d)
            (bytes(d % bytes.length) & 0xFF) / 255.0f + d * 0.001f
          }
          MediaFeatures(id, emb)
        }
      }
  }

  /** Typed resize result: same payload identity, new dims. */
  case class ResizedMedia(doc_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** STUB RESIZE — a real impl decodes, scales, re-encodes; the fake
    * truncates/extends the payload deterministically so output size
    * tracks the target area (exercising variable-width binary results
    * through the Encoder path). */
  def resize(payloadDf: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    val spark = payloadDf.sparkSession
    import spark.implicits._
    payloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val outLen = math.max(4, (w.toLong * h % 64).toInt)
          val out = Array.tabulate(outLen)(i => bytes(i % bytes.length))
          ResizedMedia(id, w, h, out)
        }
      }
  }

  /** Typed frame sample: one row per sampled frame. */
  case class Frame(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** STUB FRAME SAMPLER — a real impl seeks keyframes in a video
    * container; the fake emits `n` deterministic byte-slices. Shape:
    * one input row fans out to n output rows via iterator flatMap —
    * the row-multiplying pattern a video pipeline needs (no driver
    * involvement, stays partition-local). */
  def sampleFrames(payloadDf: DataFrame, n: Int): Dataset[Frame] = {
    val spark = payloadDf.sparkSession
    import spark.implicits._
    payloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          (0 until n).iterator.map { f =>
            val start = (f * bytes.length / n) % bytes.length
            Frame(id, f, bytes.slice(start, math.min(start + 4, bytes.length)))
          }
        }
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
