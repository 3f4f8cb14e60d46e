package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2 #30): media as opaque
  * `binary` payload columns with typed metadata, decoded per-partition.
  *
  * Two tiers of "real" here. AUDIO and IMAGE are fully real:
  * [[wavPayloads]]/[[decodeWav]] emit and parse valid RIFF/WAV PCM
  * containers (magic validation, arbitrary chunk order, padding,
  * malformed-input rejection — cross-validated against the JDK's
  * javax.sound reader), and [[bmpPayloads]]/[[decodeBmp]] do the same
  * for uncompressed 24-bit BMP images (header walk, padded bottom-up /
  * top-down pixel rows, per-channel stats — cross-validated against
  * javax.imageio). Compressed formats (JPEG/PNG/video) need codec
  * libraries the container doesn't ship, so [[decodePayload]] /
  * [[extractFeatures]] / [[resize]] / [[sampleFrames]] remain
  * DETERMINISTIC FAKES (clearly marked) around the real plumbing — the
  * binary column, the case-class schema, the `mapPartitions` batch
  * shape — that a production decode (JNI codec, ONNX session) would
  * drop into.
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

  // ---- REAL audio decode: RIFF/WAV PCM (no codec library needed) ----

  /** Decoded WAV metadata + content stats. */
  case class WavMeta(doc_id: Long, sample_rate: Int, channels: Int,
      bits_per_sample: Int, n_frames: Int, duration_ms: Double, rms: Double)

  /** Synthesize a VALID RIFF/WAV PCM payload per document: 16-bit mono,
    * sample rate and frame count derived from doc_id, samples from the
    * text's md5 bytes — deterministic, and a well-formed container a
    * real audio tool can open (the spec cross-checks with the JDK's own
    * javax.sound reader). This is the audio analog of an ingested media
    * column; unlike the image/video paths above, the WHOLE pipeline is
    * real here: valid container in, actual parser out. */
  def wavPayloads(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          md.reset()
          val h = md.digest(text.getBytes("UTF-8"))
          // floorMod: a negative doc_id must not produce rate 0/-8000
          val sampleRate = 8000 * (1 + Math.floorMod(id, 3).toInt) // 8/16/24 kHz
          val nFrames = 64 + Math.floorMod(id, 64).toInt
          val dataLen = nFrames * 2 // 16-bit mono
          val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1) // PCM
            .putShort(1) // mono
            .putInt(sampleRate)
            .putInt(sampleRate * 2) // byte rate
            .putShort(2) // block align
            .putShort(16) // bits per sample
            .put("data".getBytes("US-ASCII")).putInt(dataLen)
          var i = 0
          while (i < nFrames) {
            buf.putShort((((h(i % 16) & 0xFF) - 128) * 256).toShort)
            i += 1
          }
          (id, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  def wavPayloads(spark: SparkSession, dir: String): DataFrame =
    wavPayloads(Tables.documents(spark, dir))

  /** REAL WAV decoder: validates the RIFF/WAVE magics, walks the chunk
    * list (any order, unknown chunks skipped, word-aligned), reads the
    * fmt fields little-endian, and computes RMS over the 16-bit PCM
    * samples. Malformed payloads yield None (a corrupt file must drop
    * the row, not kill the 100 TB job). Per-partition shape as above. */
  def decodeWav(payloadDf: DataFrame): Dataset[WavMeta] = {
    val spark = payloadDf.sparkSession
    import spark.implicits._
    payloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => parseWav(id, bytes) })
  }

  private[graft] def parseWav(id: Long, bytes: Array[Byte]): Option[WavMeta] = {
    if (bytes.length < 44) return None
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val a = new Array[Byte](n); buf.get(a); new String(a, "US-ASCII")
    }
    if (ascii(4) != "RIFF") return None
    buf.getInt // declared riff size; tolerated if short (streaming writers)
    if (ascii(4) != "WAVE") return None
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, len)
    var halted = false
    while (!halted && (fmt.isEmpty || data.isEmpty) && buf.remaining() >= 8) {
      val cid = ascii(4)
      val len = buf.getInt
      if (len < 0 || len > buf.remaining()) {
        // garbage where a chunk header should be: stop the walk — fatal
        // only if the needed chunks were never found (trailing fill
        // bytes after fmt+data must not reject a decodable file)
        halted = true
      } else cid match {
        case "fmt " =>
          if (len < 16) halted = true
          else {
            val p = buf.position()
            val audioFormat = buf.getShort
            val channels = buf.getShort.toInt
            val rate = buf.getInt
            buf.getInt; buf.getShort // byte rate, block align
            val bits = buf.getShort.toInt
            // PCM only, and fields must be sane — a zero rate would
            // otherwise emit Infinity durations downstream
            if (audioFormat != 1 || rate <= 0 || channels <= 0
              || !Set(8, 16, 24, 32).contains(bits)) return None
            fmt = Some((channels, rate, bits))
            buf.position(p + len)
          }
        case "data" =>
          data = Some((buf.position(), len))
          buf.position(buf.position() + len)
        case _ =>
          buf.position(buf.position() + len)
      }
      if (!halted && len % 2 == 1 && buf.remaining() > 0) buf.get // chunk padding
    }
    for ((channels, rate, bits) <- fmt; (off, len) <- data) yield {
      val bytesPerFrame = channels * (bits / 8)
      val nFrames = if (bytesPerFrame > 0) len / bytesPerFrame else 0
      var sumSq = 0.0
      if (bits == 16) {
        val sb = java.nio.ByteBuffer.wrap(bytes, off, len)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
        while (sb.hasRemaining) { val s = sb.get.toDouble; sumSq += s * s }
      }
      val nSamples = nFrames * channels
      WavMeta(id, rate, channels, bits, nFrames,
        nFrames * 1000.0 / rate,
        if (nSamples > 0 && bits == 16) math.sqrt(sumSq / nSamples) else 0.0)
    }
  }

  // ---- audio feature extraction over decoded PCM ----

  /** Per-payload audio features: zero-crossing rate and spectral
    * centroid. */
  case class AudioFeatures(doc_id: Long, sample_rate: Int, n_frames: Int,
      zcr: Double, centroid_hz: Double)

  /** Window length for the centroid DFT (bounds per-row cost: the
    * naive DFT is O(DftN²/2) ≈ 0.5M mults — constant per payload). */
  val DftN = 1024

  /** REAL audio features from 16-bit PCM WAV payloads: channel-mixed
    * mono signal → zero-crossing rate (sign changes / (n−1)) and
    * spectral centroid (Σ f_k·|X_k| / Σ|X_k| over a [[DftN]]-sample
    * direct DFT, DC bin excluded). A pure tone's centroid lands on the
    * tone frequency and its ZCR on 2f/rate — the spec asserts exactly
    * that physics on synthesized sines, which makes the reference
    * ground truth analytic rather than another implementation.
    * Malformed/non-16-bit payloads drop (the decoder contract). Same
    * `mapPartitions` codec shape as [[decodeWav]]. */
  def audioFeatures(payloadDf: DataFrame): Dataset[AudioFeatures] = {
    val spark = payloadDf.sparkSession
    import spark.implicits._
    payloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        wavMonoSamples(bytes).map { case (rate, x) =>
          var crossings = 0
          var i = 1
          while (i < x.length) {
            if ((x(i - 1) >= 0) != (x(i) >= 0)) crossings += 1
            i += 1
          }
          val zcr = if (x.length > 1) crossings.toDouble / (x.length - 1) else 0.0
          val n = math.min(DftN, x.length)
          var num = 0.0; var den = 0.0
          var k = 1
          while (k <= n / 2) {
            var re = 0.0; var im = 0.0
            val w = 2.0 * math.Pi * k / n
            var t = 0
            while (t < n) {
              re += x(t) * math.cos(w * t)
              im -= x(t) * math.sin(w * t)
              t += 1
            }
            val mag = math.sqrt(re * re + im * im)
            num += (k.toDouble * rate / n) * mag
            den += mag
            k += 1
          }
          AudioFeatures(id, rate, x.length,
            zcr, if (den > 0) num / den else 0.0)
        }
      })
  }

  /** Chunk-walk a WAV payload and mix 16-bit PCM frames to one mono
    * double channel (shares [[parseWav]]'s validation semantics). */
  private[graft] def wavMonoSamples(bytes: Array[Byte]): Option[(Int, Array[Double])] =
    parseWav(0L, bytes).filter(_.bits_per_sample == 16).flatMap { meta =>
      // re-walk to the data chunk (cheap: header-sized, not data-sized)
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.position(12)
      var dataOff = -1; var dataLen = 0
      while (dataOff < 0 && buf.remaining() >= 8) {
        val a = new Array[Byte](4); buf.get(a)
        val cid = new String(a, "US-ASCII")
        val len = buf.getInt
        if (len < 0 || len > buf.remaining()) return None
        if (cid == "data") { dataOff = buf.position(); dataLen = len }
        buf.position(buf.position() + len)
        if (len % 2 == 1 && buf.remaining() > 0) buf.get
      }
      if (dataOff < 0) None
      else {
        val ch = meta.channels
        val sb = java.nio.ByteBuffer.wrap(bytes, dataOff, dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
        val nFrames = dataLen / (2 * ch)
        val out = new Array[Double](nFrames)
        var f = 0
        while (f < nFrames) {
          var s = 0.0
          var c = 0
          while (c < ch) { s += sb.get(f * ch + c); c += 1 }
          out(f) = s / ch
          f += 1
        }
        Some((meta.sample_rate, out))
      }
    }

  // ---- REAL image decode: uncompressed 24-bit BMP (no codec lib) ----

  /** Decoded BMP metadata + content stats. */
  case class BmpMeta(doc_id: Long, width: Int, height: Int, bpp: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Synthesize a VALID uncompressed 24-bit BMP per document: dims from
    * doc_id, pixels cycled from the text's md5 bytes — deterministic,
    * and a well-formed file any image tool opens (the spec cross-checks
    * with the JDK's own javax.imageio BMP reader). The image analog of
    * [[wavPayloads]]: container in, actual parser out, nothing faked. */
  def bmpPayloads(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          md.reset()
          val h = md.digest(text.getBytes("UTF-8"))
          val w = 4 + Math.floorMod(id, 13).toInt
          val ht = 3 + Math.floorMod(id, 7).toInt
          val rowSize = ((24 * w + 31) / 32) * 4 // rows pad to 4 bytes
          val dataLen = rowSize * ht
          val buf = java.nio.ByteBuffer.allocate(54 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put('B'.toByte).put('M'.toByte)
            .putInt(54 + dataLen).putInt(0).putInt(54) // size, reserved, data offset
            .putInt(40).putInt(w).putInt(ht)           // BITMAPINFOHEADER
            .putShort(1).putShort(24)                  // planes, bpp
            .putInt(0).putInt(dataLen)                 // BI_RGB, image size
            .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette
          var y = 0
          var k = 0
          while (y < ht) {
            var x = 0
            while (x < w) { // pixel order B, G, R
              buf.put(h(k % 16)).put(h((k + 5) % 16)).put(h((k + 11) % 16))
              k += 1; x += 1
            }
            var p = 3 * w
            while (p < rowSize) { buf.put(0.toByte); p += 1 }
            y += 1
          }
          (id, buf.array())
        }
      }.toDF("doc_id", "payload")
  }

  def bmpPayloads(spark: SparkSession, dir: String): DataFrame =
    bmpPayloads(Tables.documents(spark, dir))

  /** REAL BMP decoder: validates the BM magic, reads the
    * BITMAPINFOHEADER little-endian (any DIB header ≥ 40 bytes),
    * accepts uncompressed 24-bit data in either row order (positive
    * height = bottom-up, negative = top-down — irrelevant to channel
    * means but parsed correctly), walks the padded pixel rows from the
    * declared data offset, and computes per-channel means. Malformed
    * payloads yield None — a corrupt file drops the row, never the job.
    */
  def decodeBmp(payloadDf: DataFrame): Dataset[BmpMeta] = {
    val spark = payloadDf.sparkSession
    import spark.implicits._
    payloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => parseBmp(id, bytes) })
  }

  private[graft] def parseBmp(id: Long, bytes: Array[Byte]): Option[BmpMeta] = {
    if (bytes.length < 54) return None
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (buf.get() != 'B'.toByte || buf.get() != 'M'.toByte) return None
    buf.getInt // declared file size; tolerated if inconsistent
    buf.getInt // reserved
    val dataOffset = buf.getInt
    val dibSize = buf.getInt
    if (dibSize < 40) return None // BITMAPCOREHEADER not supported
    val w = buf.getInt
    val rawH = buf.getInt
    // abs(Int.MinValue) is still negative — reject it explicitly or the
    // sign checks below all mis-fire on a crafted height
    if (rawH == Int.MinValue) return None
    val ht = math.abs(rawH)
    buf.getShort // planes
    val bpp = buf.getShort.toInt
    val compression = buf.getInt
    if (compression != 0 || bpp != 24 || w <= 0 || ht <= 0) return None
    // all size math in Long: a ~2^29 width overflows an Int rowSize to
    // negative, which would slip past the fit check and crash the pixel
    // walk on a 54-byte payload
    val rowSizeL = (bpp.toLong * w + 31) / 32 * 4
    if (dataOffset < 54 || rowSizeL * ht > bytes.length.toLong - dataOffset) return None
    val rowSize = rowSizeL.toInt // fits: bounded by bytes.length above
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < ht) {
      var p = dataOffset + y * rowSize
      var x = 0
      while (x < w) {
        sb += bytes(p) & 0xFF
        sg += bytes(p + 1) & 0xFF
        sr += bytes(p + 2) & 0xFF
        p += 3; x += 1
      }
      y += 1
    }
    val n = w.toLong * ht
    Some(BmpMeta(id, w, ht, bpp, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
  }

  // ---- REAL image decode: PNG (JDK zlib + CRC32, no codec lib) ----

  /** Decoded PNG metadata + content stats. */
  case class PngMeta(doc_id: Long, width: Int, height: Int, bit_depth: Int,
      color_type: Int, mean_r: Double, mean_g: Double, mean_b: Double)

  /** Synthesize a VALID 8-bit RGB non-interlaced PNG per document:
    * dims from doc_id, pixels cycled from the text's md5 bytes, and —
    * deliberately — the row FILTER TYPE cycles 0..4 (None/Sub/Up/
    * Average/Paeth), so every unfilter path in [[parsePng]] runs on
    * every image taller than 4 rows. The deflate stream is split
    * across TWO IDAT chunks to exercise chunk concatenation. Output is
    * a spec-valid file any PNG tool opens (the spec cross-checks
    * against the JDK's own javax.imageio PNG reader). */
  def pngPayloads(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          md.reset()
          (id, buildPng(id, md.digest(text.getBytes("UTF-8"))))
        }
      }.toDF("doc_id", "payload")
  }

  def pngPayloads(spark: SparkSession, dir: String): DataFrame =
    pngPayloads(Tables.documents(spark, dir))

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private[graft] def buildPng(id: Long, h: Array[Byte]): Array[Byte] = {
    val w = 4 + Math.floorMod(id, 13).toInt
    val ht = 3 + Math.floorMod(id, 7).toInt
    val bpp = 3
    // raw RGB rows
    val raw = Array.ofDim[Byte](ht, w * bpp)
    var k = 0
    for (y <- 0 until ht; x <- 0 until w) {
      raw(y)(x * 3) = h(k % 16)
      raw(y)(x * 3 + 1) = h((k + 5) % 16)
      raw(y)(x * 3 + 2) = h((k + 11) % 16)
      k += 1
    }
    // filtered scanlines: type byte + transformed row
    val lines = new java.io.ByteArrayOutputStream()
    for (y <- 0 until ht) {
      val ft = y % 5
      lines.write(ft)
      val row = raw(y)
      val prior = if (y > 0) raw(y - 1) else new Array[Byte](w * bpp)
      for (i <- row.indices) {
        val x = row(i) & 0xFF
        val a = if (i >= bpp) row(i - bpp) & 0xFF else 0
        val b = prior(i) & 0xFF
        val c = if (i >= bpp) prior(i - bpp) & 0xFF else 0
        val out = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        lines.write(out & 0xFF)
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(lines.toByteArray); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](512)
    while (!deflater.finished()) comp.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val z = comp.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(4).putInt(data.length)
      out.write(bb.array())
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(ht).put(8.toByte).put(2.toByte) // depth 8, RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter0, no interlace
    chunk("IHDR", ihdr.array())
    val half = z.length / 2
    chunk("IDAT", z.slice(0, half)) // two IDATs: concat is part of the spec
    chunk("IDAT", z.slice(half, z.length))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** REAL PNG decoder: validates the signature, walks the chunk list
    * VERIFYING each CRC32, parses IHDR big-endian, concatenates the
    * IDAT deflate stream, inflates it with the JDK zlib, reverses all
    * five scanline filters (None/Sub/Up/Average/Paeth), and computes
    * per-channel means (RGB and RGBA, alpha excluded from means).
    * Malformed payloads — bad magic, CRC mismatch, truncated stream,
    * unsupported layout (interlaced, paletted, 16-bit) — yield None:
    * a corrupt file drops the row, never the 100 TB job. */
  def decodePng(payloadDf: DataFrame): Dataset[PngMeta] = {
    val spark = payloadDf.sparkSession
    import spark.implicits._
    payloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => parsePng(id, bytes) })
  }

  private[graft] def parsePng(id: Long, bytes: Array[Byte]): Option[PngMeta] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (bytes.length < 8 + 25 || !bytes.take(8).sameElements(sig)) return None
    val buf = java.nio.ByteBuffer.wrap(bytes) // PNG is big-endian
    buf.position(8)
    var (w, ht, depth, colorType) = (0, 0, 0, -1)
    val idat = new java.io.ByteArrayOutputStream()
    var sawIhdr = false
    var sawIend = false
    while (!sawIend && buf.remaining() >= 12) {
      val len = buf.getInt
      if (len < 0 || len > buf.remaining() - 8) return None
      val tb = new Array[Byte](4); buf.get(tb)
      val typ = new String(tb, "US-ASCII")
      val data = new Array[Byte](len); buf.get(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      if (crc.getValue.toInt != buf.getInt) return None // corrupt chunk
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          val ib = java.nio.ByteBuffer.wrap(data)
          w = ib.getInt; ht = ib.getInt
          depth = ib.get & 0xFF; colorType = ib.get & 0xFF
          val (compression, filterM, interlace) =
            (ib.get & 0xFF, ib.get & 0xFF, ib.get & 0xFF)
          // supported layout: 8-bit RGB / RGBA, deflate, filter method
          // 0, non-interlaced; sane dims (area bound keeps the inflate
          // allocation proportional to the payload's own claim)
          if (depth != 8 || !(colorType == 2 || colorType == 6) ||
            compression != 0 || filterM != 0 || interlace != 0 ||
            w <= 0 || ht <= 0 || w.toLong * ht > (1L << 26)) return None
          sawIhdr = true
        case "IDAT" => if (!sawIhdr) return None else idat.write(data)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunk: CRC-checked, content ignored
      }
    }
    if (!sawIhdr || !sawIend || idat.size() == 0) return None
    val bpp = if (colorType == 6) 4 else 3
    val expect = ht.toLong * (1 + w.toLong * bpp)
    if (expect > Int.MaxValue) return None
    val rawOut = new Array[Byte](expect.toInt)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val got = try {
      var off = 0
      while (off < rawOut.length && !inflater.finished()) {
        val n = inflater.inflate(rawOut, off, rawOut.length - off)
        // any zero-progress state is unrecoverable here — all input was
        // provided up front and output space remains. Covers truncated
        // streams (needsInput) AND the FDICT preset-dictionary flag
        // (needsDictionary), where inflate() returns 0 forever: without
        // this a crafted payload with valid CRCs wedges the task in an
        // infinite loop instead of dropping the row
        if (n == 0) return None
        off += n
      }
      // geometry must match EXACTLY: a stream that decodes to MORE
      // bytes than IHDR declares is malformed, not truncatable. If the
      // final block landed exactly on the buffer boundary, finished()
      // may need one more inflate call to consume the stream trailer —
      // a conforming stream produces zero further bytes there.
      if (off == rawOut.length && !inflater.finished()) {
        val probe = new Array[Byte](1)
        if (inflater.inflate(probe) != 0 || !inflater.finished()) return None
      }
      off
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    if (got != rawOut.length) return None
    // unfilter in place, row by row
    val stride = 1 + w * bpp
    var (sr, sg, sb) = (0L, 0L, 0L)
    val prior = new Array[Int](w * bpp)
    val cur = new Array[Int](w * bpp)
    var y = 0
    while (y < ht) {
      val ft = rawOut(y * stride) & 0xFF
      if (ft > 4) return None
      var i = 0
      while (i < w * bpp) {
        val x = rawOut(y * stride + 1 + i) & 0xFF
        val a = if (i >= bpp) cur(i - bpp) else 0
        val b = prior(i)
        val c = if (i >= bpp) prior(i - bpp) else 0
        cur(i) = (ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, c)
        }) & 0xFF
        i += 1
      }
      var px = 0
      while (px < w) {
        sr += cur(px * bpp); sg += cur(px * bpp + 1); sb += cur(px * bpp + 2)
        px += 1
      }
      System.arraycopy(cur, 0, prior, 0, w * bpp)
      y += 1
    }
    val n = w.toLong * ht
    Some(PngMeta(id, w, ht, depth, colorType,
      sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
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

  /** q238: the REAL PNG pixel pipeline under the driver's FULL-HASH
    * gate (r13 verdict #6 asked for at least rows-only; value-level is
    * possible because [[buildPng]]'s raster is a pure function of
    * md5(text) and doc_id). Per document: synthesize the spec-valid
    * two-IDAT PNG, then run [[parsePng]] — signature check, CRC32
    * verification of every chunk, IDAT concatenation, JDK inflate,
    * all FIVE scanline unfilters (the builder cycles filter types
    * 0..4), per-channel means over the reconstructed raster. The
    * DuckDB twin recomputes the expected means arithmetically:
    * pixel k of channel with offset d is digest byte (k+d) mod 16, so
    * channel_sum = ⌊n/16⌋·Σb + Σ_{(i−d) mod 16 < n mod 16} b_i with
    * n = w·h. ANY decode failure (bad CRC, wedged inflate, wrong
    * geometry, filter bug) drops or corrupts rows and the hash/row
    * gate fails — the real parser is the thing under test. */
  def pngDecodeAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodePng(pngPayloads(Tables.documents(spark, dir)))
      .toDF()
      .selectExpr("doc_id", "width", "height", "bit_depth", "color_type",
        "round(mean_r, 6) + 0.0 AS mean_r",
        "round(mean_g, 6) + 0.0 AS mean_g",
        "round(mean_b, 6) + 0.0 AS mean_b")
  }

  /** DuckDB twin of [[pngDecodeAudit]]: exact integer reconstruction
    * of the channel sums from md5(text) + doc_id geometry; the one
    * double division (sum/n) is the same IEEE op on the same exact
    * integers as the decoder's `sr.toDouble / n`. */
  val pngDecodeAuditSql: String = {
    // Σ over the first (n mod 16) pixels of channel offset d hits
    // exactly the byte indices i with ((i - d) mod 16) < (n mod 16)
    def rem(d: Int): String =
      s"sum(CASE WHEN (i + ${16 - d}) % 16 < n % 16 THEN v ELSE 0 END)"
    def mean(d: Int, as: String): String =
      s"round(CAST((n // 16) * sum(v) + ${rem(d)} AS DOUBLE)" +
        s" / CAST(n AS DOUBLE), 6) + 0.0 AS $as"
    s"""WITH geo AS (
       |  SELECT doc_id, md5(text) AS h,
       |    (4 + doc_id % 13) * (3 + doc_id % 7) AS n,
       |    CAST(4 + doc_id % 13 AS INT) AS width,
       |    CAST(3 + doc_id % 7 AS INT) AS height
       |  FROM documents),
       |b AS (
       |  SELECT doc_id, width, height, n, i,
       |    ('0x' || substr(h, 2 * i + 1, 2))::INT AS v
       |  FROM geo, range(16) t(i))
       |SELECT doc_id, width, height, 8 AS bit_depth, 2 AS color_type,
       |  ${mean(0, "mean_r")},
       |  ${mean(5, "mean_g")},
       |  ${mean(11, "mean_b")}
       |FROM b GROUP BY doc_id, width, height, n""".stripMargin
  }

  /** q255: the REAL WAV pipeline under the driver's FULL-HASH gate —
    * the audio analog of q238: per document, synthesize the valid
    * RIFF/WAV PCM payload ([[wavPayloads]]) and run the real chunk-walk
    * parser ([[decodeWav]]); the DuckDB twin recomputes everything
    * arithmetically from md5(text) + doc_id (rate/frames from doc_id,
    * the RMS from the 16-cycled sample-square sum — the q238 cycled-sum
    * identity on squares). ANY parser fault (magic, chunk walk, fmt
    * fields, sample read) drops or corrupts rows and the gate fails. */
  def wavDecodeAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeWav(wavPayloads(Tables.documents(spark, dir)))
      .toDF()
      .selectExpr("doc_id", "sample_rate", "channels", "bits_per_sample",
        "n_frames",
        "round(duration_ms, 6) + 0.0 AS duration_ms",
        "round(rms, 6) + 0.0 AS rms")
  }

  /** DuckDB twin of [[wavDecodeAudit]]: samples are
    * s_i = (md5byte(i mod 16) − 128)·256, so the frame-square sum over
    * n frames is ⌊n/16⌋·Σs² + Σ_{i < n mod 16} s_i² — exact integers;
    * duration and RMS are the decoder's own IEEE ops on the same
    * exact operands. */
  val wavDecodeAuditSql: String =
    """WITH geo AS (
      |  SELECT doc_id, md5(text) AS h,
      |    CAST(8000 * (1 + doc_id % 3) AS INT) AS rate,
      |    CAST(64 + doc_id % 64 AS INT) AS nf
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, rate, nf, i,
      |    (('0x' || substr(h, 2 * i + 1, 2))::INT - 128) * 256 AS s
      |  FROM geo, range(16) t(i)),
      |agg AS (
      |  SELECT doc_id, rate, nf,
      |    (nf // 16) * sum(CAST(s AS BIGINT) * s)
      |      + sum(CASE WHEN i < nf % 16 THEN CAST(s AS BIGINT) * s
      |            ELSE 0 END) AS ssq
      |  FROM b GROUP BY 1, 2, 3)
      |SELECT doc_id, rate AS sample_rate, 1 AS channels,
      |  16 AS bits_per_sample, nf AS n_frames,
      |  round(CAST(nf AS DOUBLE) * 1000.0 / CAST(rate AS DOUBLE), 6)
      |    + 0.0 AS duration_ms,
      |  round(sqrt(CAST(ssq AS DOUBLE) / CAST(nf AS DOUBLE)), 6)
      |    + 0.0 AS rms
      |FROM agg""".stripMargin

  // ---- REAL image decode: GIF (LZW) ----

  /** Decoded GIF metadata + content stats (first frame).
    * `width`/`height` are the FIRST IMAGE DESCRIPTOR's (frame) dims —
    * the pixel grid `n_colors` and the channel means were computed
    * over — while `screen_width`/`screen_height` carry the logical
    * screen descriptor, which may be larger for a GIF whose first
    * frame covers only part of the canvas. Mixing the two frames of
    * reference (screen dims + frame-pixel means) was a round-6 advice
    * finding; both are reported so they can never disagree silently. */
  case class GifMeta(doc_id: Long, width: Int, height: Int,
      screen_width: Int, screen_height: Int, n_colors: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Synthesize a VALID GIF per document via the JDK's own ImageIO
    * writer (deterministic: dims from doc_id, pixels cycled from the
    * text's md5 bytes) — the one payload builder that is NOT
    * hand-rolled, because a GIF encoder means implementing LZW
    * compression twice; the DECODER below is still independently
    * validated (our parse vs javax's parse of the same bytes). */
  def gifPayloads(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          md.reset()
          val h = md.digest(text.getBytes("UTF-8"))
          val w = 8 + Math.floorMod(id, 24).toInt
          val ht = 8 + Math.floorMod(id / 7, 24).toInt
          val img = new java.awt.image.BufferedImage(
            w, ht, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0
          var y = 0
          while (y < ht) {
            var x = 0
            while (x < w) {
              val r = h(i % 16) & 0xFF
              val g = h((i + 5) % 16) & 0xFF
              val b = h((i + 11) % 16) & 0xFF
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              i += 1; x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "gif", baos)
          (id, baos.toByteArray)
        }
      }.toDF("doc_id", "payload")
  }

  def gifPayloads(spark: SparkSession, dir: String): DataFrame =
    gifPayloads(Tables.documents(spark, dir))

  /** REAL GIF decoder: header + logical screen descriptor, global /
    * local color tables, extension-block skipping, first image
    * descriptor, LZW decompression of the concatenated data
    * sub-blocks (variable code width, clear/EOI handling, 12-bit
    * dictionary cap), palette lookup, per-channel means (placement-
    * invariant, so interlaced frames need no row deshuffle). Malformed
    * streams drop the row. */
  def decodeGif(payloadDf: DataFrame): Dataset[GifMeta] = {
    val spark = payloadDf.sparkSession
    import spark.implicits._
    payloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => parseGif(id, bytes) })
  }

  private[graft] def parseGif(id: Long, bytes: Array[Byte]): Option[GifMeta] = {
    def u8(i: Int) = bytes(i) & 0xFF
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    if (bytes.length < 13) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val sw = u16(6); val sh = u16(8)
    val flags = u8(10)
    var pos = 13
    var gct: Array[Int] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      if (pos + 3 * n > bytes.length) return None
      gct = Array.tabulate(n)(j =>
        (u8(pos + 3 * j) << 16) | (u8(pos + 3 * j + 1) << 8) | u8(pos + 3 * j + 2))
      pos += 3 * n
    }
    // walk blocks to the first image descriptor
    while (pos < bytes.length) {
      u8(pos) match {
        case 0x3B => return None // trailer before any image
        case 0x21 => // extension: label byte + data sub-blocks
          pos += 2
          while (pos < bytes.length && u8(pos) != 0) pos += 1 + u8(pos)
          pos += 1
        case 0x2C =>
          if (pos + 10 > bytes.length) return None
          val iw = u16(pos + 5); val ih = u16(pos + 7)
          val iflags = u8(pos + 9)
          // interlace (bit 6, and the JDK writer's default) only permutes
          // ROW order; the per-channel means computed here are placement-
          // invariant, so no deshuffle is needed. A consumer of actual
          // pixel positions would reorder rows by the 8/8/4/2 pass scheme.
          pos += 10
          var pal = gct
          if ((iflags & 0x80) != 0) {
            val n = 2 << (iflags & 7)
            if (pos + 3 * n > bytes.length) return None
            pal = Array.tabulate(n)(j =>
              (u8(pos + 3 * j) << 16) | (u8(pos + 3 * j + 1) << 8) | u8(pos + 3 * j + 2))
            pos += 3 * n
          }
          if (pal == null || pos >= bytes.length) return None
          val minCode = u8(pos); pos += 1
          if (minCode < 2 || minCode > 11) return None
          // concatenate data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (pos < bytes.length && u8(pos) != 0) {
            val len = u8(pos)
            if (pos + 1 + len > bytes.length) return None
            data.write(bytes, pos + 1, len)
            pos += 1 + len
          }
          val idx = lzwDecode(data.toByteArray, minCode, iw * ih)
            .getOrElse(return None)
          if (idx.length < iw * ih) return None
          var (sr, sg, sb) = (0L, 0L, 0L)
          var k = 0
          while (k < iw * ih) {
            val c = pal(math.min(idx(k), pal.length - 1))
            sr += (c >> 16) & 0xFF; sg += (c >> 8) & 0xFF; sb += c & 0xFF
            k += 1
          }
          val n = (iw * ih).toDouble
          return Some(GifMeta(id, iw, ih, sw, sh, pal.length,
            sr / n, sg / n, sb / n))
        case _ => return None
      }
    }
    None
  }

  /** GIF-variant LZW: variable code width from `minCode`+1 up to 12
    * bits, CLEAR resets the dictionary, EOI ends the stream. Returns
    * up to `maxPixels` palette indices. */
  private def lzwDecode(data: Array[Byte], minCode: Int,
      maxPixels: Int): Option[Array[Int]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    // dictionary: suffix byte + prefix link; roots are 0..clear-1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var dictSize = eoi + 1
    var codeWidth = minCode + 1
    var prev = -1
    var acc = 0L
    var accBits = 0
    var bytePos = 0
    val stack = new Array[Byte](4096)
    def emit(code: Int): Boolean = { // expand code to out via the chain
      var sp = 0
      var c = code
      while (c >= clear) { // composite codes chain down to a root
        if (sp >= stack.length || c >= dictSize) return false
        stack(sp) = suffix(c); sp += 1; c = prefix(c)
      }
      out.write(c)
      var j = sp - 1
      while (j >= 0) { out.write(stack(j)); j -= 1 }
      true
    }
    def firstByte(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }
    while (bytePos < data.length && out.size < maxPixels) {
      acc |= (data(bytePos) & 0xFFL) << accBits
      accBits += 8
      bytePos += 1
      while (accBits >= codeWidth && out.size < maxPixels) {
        val code = (acc & ((1 << codeWidth) - 1)).toInt
        acc >>= codeWidth
        accBits -= codeWidth
        if (code == clear) {
          dictSize = eoi + 1; codeWidth = minCode + 1; prev = -1
        } else if (code == eoi) {
          return Some(outToInts(out))
        } else {
          if (prev < 0) {
            if (code >= clear) return None // first code must be a root
            out.write(code)
          } else {
            if (code < dictSize) {
              if (!emit(code)) return None
              if (dictSize < 4096) {
                prefix(dictSize) = prev
                suffix(dictSize) = firstByte(code).toByte
                dictSize += 1
              }
            } else if (code == dictSize && dictSize < 4096) {
              // the KwK case: new entry = prev + firstByte(prev)
              prefix(dictSize) = prev
              suffix(dictSize) = firstByte(prev).toByte
              dictSize += 1
              if (!emit(code)) return None
            } else return None
            if (dictSize == (1 << codeWidth) && codeWidth < 12)
              codeWidth += 1
          }
          prev = code
        }
      }
    }
    Some(outToInts(out))
  }

  private def outToInts(out: java.io.ByteArrayOutputStream): Array[Int] =
    out.toByteArray.map(_ & 0xFF)

  // ---- JPEG metadata scan (marker walk, NO entropy decode) ----

  /** JPEG frame metadata: dims/components/precision from the SOF
    * marker, progressive flag, EXIF presence. */
  case class JpegMeta(doc_id: Long, width: Int, height: Int,
      n_components: Int, bits: Int, progressive: Boolean, has_exif: Boolean)

  /** Synthesize a valid JPEG per document via the JDK's own ImageIO
    * writer (like [[gifPayloads]]: writing a DCT+Huffman encoder twice
    * is pointless; the metadata PARSER below stays independent). */
  def jpegPayloads(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          md.reset()
          val h = md.digest(text.getBytes("UTF-8"))
          val w = 8 + Math.floorMod(id, 24).toInt
          val ht = 8 + Math.floorMod(id / 7, 24).toInt
          val img = new java.awt.image.BufferedImage(
            w, ht, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0
          for (y <- 0 until ht; x <- 0 until w) {
            img.setRGB(x, y, ((h(i % 16) & 0xFF) << 16) |
              ((h((i + 5) % 16) & 0xFF) << 8) | (h((i + 11) % 16) & 0xFF))
            i += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", baos)
          (id, baos.toByteArray)
        }
      }.toDF("doc_id", "payload")
  }

  def jpegPayloads(spark: SparkSession, dir: String): DataFrame =
    jpegPayloads(Tables.documents(spark, dir))

  /** REAL JPEG metadata extraction WITHOUT entropy decode — the
    * marker-segment walk every at-scale image pipeline runs first
    * (dims/format triage is orders cheaper than DCT decode, and most
    * corpus images are filtered on metadata before any pixel work):
    * SOI, then length-framed segments to the first SOF0–SOF15 frame
    * header (height/width/components/precision; SOF2 ⇒ progressive),
    * noting APP1 "Exif" presence. Entropy-coded bytes are never
    * touched. Malformed streams drop the row. */
  def decodeJpegMeta(payloadDf: DataFrame): Dataset[JpegMeta] = {
    val spark = payloadDf.sparkSession
    import spark.implicits._
    payloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => parseJpegMeta(id, bytes) })
  }

  // ---- mixed-format triage: sniff + dispatch over a heterogeneous corpus ----

  /** Magic-byte container sniff — the first-pass router a real corpus
    * needs, because TAR shards and crawl dumps interleave formats. */
  private[graft] def sniffFormat(bytes: Array[Byte]): Option[String] = {
    def u8(i: Int) = bytes(i) & 0xFF
    if (bytes.length < 12) None
    else if (u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G') Some("png")
    else if (u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8') Some("gif")
    else if (u8(0) == 'B' && u8(1) == 'M') Some("bmp")
    else if (u8(0) == 0xFF && u8(1) == 0xD8) Some("jpeg")
    else if (u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F' &&
      u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' && u8(11) == 'E') Some("wav")
    else None
  }

  /** Normalized triage row for any image container. */
  case class ImageMeta(doc_id: Long, format: String, width: Int, height: Int)

  /** A deliberately HETEROGENEOUS payload corpus: each document's
    * format is chosen by doc_id % 4 across BMP/PNG/GIF/JPEG — the
    * mixed-shard shape [[decodeImageMeta]] exists for. */
  def mixedImagePayloads(docs: DataFrame): DataFrame = {
    def part(rem: Int, build: DataFrame => DataFrame) =
      build(docs.filter(col("doc_id") % 4 === rem))
    part(0, bmpPayloads).unionByName(part(1, pngPayloads))
      .unionByName(part(2, gifPayloads)).unionByName(part(3, jpegPayloads))
  }

  /** Sniff-and-dispatch decode over a mixed corpus: route each payload
    * by magic bytes to its real parser, normalize to (doc_id, format,
    * width, height). Unknown containers and corrupt streams drop the
    * row — per-partition dispatch, no per-format corpus passes. */
  def decodeImageMeta(payloadDf: DataFrame): Dataset[ImageMeta] = {
    val spark = payloadDf.sparkSession
    import spark.implicits._
    payloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        sniffFormat(bytes).flatMap {
          case "bmp" => parseBmp(id, bytes).map(m => ImageMeta(id, "bmp", m.width, m.height))
          case "png" => parsePng(id, bytes).map(m => ImageMeta(id, "png", m.width, m.height))
          case "gif" => parseGif(id, bytes).map(m => ImageMeta(id, "gif", m.width, m.height))
          case "jpeg" => parseJpegMeta(id, bytes).map(m => ImageMeta(id, "jpeg", m.width, m.height))
          case _ => None // wav etc.: not an image
        }
      })
  }

  private[graft] def parseJpegMeta(id: Long, bytes: Array[Byte]): Option[JpegMeta] = {
    def u8(i: Int) = bytes(i) & 0xFF
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1) // big-endian, unlike GIF/BMP
    if (bytes.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None // SOI
    var pos = 2
    var hasExif = false
    while (pos + 4 <= bytes.length) {
      if (u8(pos) != 0xFF) return None // marker alignment lost
      var marker = u8(pos + 1)
      // fill bytes: consecutive FFs pad before a marker
      var p = pos + 1
      while (marker == 0xFF && p + 1 < bytes.length) { p += 1; marker = u8(p) }
      pos = p - 1
      marker match {
        case 0xD9 => return None                   // EOI before any frame
        case m if m >= 0xD0 && m <= 0xD7 => pos += 2 // RSTn: no length
        case 0x01 => pos += 2                       // TEM: no length
        case m if m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC =>
          // SOFn frame header: [len][bits][h][w][ncomp]
          if (pos + 10 > bytes.length) return None
          val bits = u8(pos + 4)
          val h = u16(pos + 5); val w = u16(pos + 7)
          val ncomp = u8(pos + 9)
          if (w == 0 || h == 0 || ncomp == 0) return None
          return Some(JpegMeta(id, w, h, ncomp, bits,
            progressive = (m == 0xC2 || m == 0xC6 || m == 0xCA || m == 0xCE),
            has_exif = hasExif))
        case _ =>
          if (pos + 4 > bytes.length) return None
          val len = u16(pos + 2)
          if (len < 2 || pos + 2 + len > bytes.length) return None
          if (marker == 0xE1 && len >= 8 &&
            new String(bytes, pos + 4, 4, "US-ASCII") == "Exif") hasExif = true
          pos += 2 + len
      }
    }
    None
  }
}
