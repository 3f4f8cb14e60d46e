package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import multimodal.Multimodal

/** Multimodal plumbing: the typed mapPartitions decode path must agree
  * exactly with the declarative (oracle-checked) twin. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("q30: mapPartitions decode == declarative metadata query, row for row") {
    val typed = Multimodal.decodePayload(Multimodal.payloads(spark, dir)).toDF()
    val declarative = Multimodal.multimodalMeta(spark, dir)
    assert(typed.count() == declarative.count())
    val diff = typed.join(declarative,
      Seq("doc_id", "payload_len", "format", "width", "height"), "left_anti")
    assert(diff.count() == 0, "decode paths disagree")
  }

  test("q30: payloads are binary, 16 bytes, deterministic") {
    val df = Multimodal.payloads(spark, dir).cache()
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.filter(length(col("payload")) =!= 16).count() == 0)
  }

  test("feature extraction: fixed-dim embeddings, deterministic, ANN-consumable") {
    val payloads = Multimodal.payloads(spark, dir)
    val feats = Multimodal.extractFeatures(payloads).toDF().cache()
    assert(feats.count() == payloads.count())
    assert(feats.filter(size(col("embedding")) =!= Multimodal.FeatureDim).count() == 0)
    // deterministic: extracting twice gives identical embeddings
    val again = Multimodal.extractFeatures(payloads).toDF()
      .withColumnRenamed("embedding", "emb2")
    val joined = feats.join(again, "doc_id")
      .filter(col("embedding") =!= col("emb2"))
    assert(joined.count() == 0)
    // composes with the ANN module (vec_id/embedding schema) end-to-end
    val asVecs = feats.select(col("doc_id").as("vec_id"), col("embedding"))
    val nd = ann.Ann.embedNearDup(asVecs, dim = Multimodal.FeatureDim).cache()
    assert(nd.columns.sameElements(Array("vec_a", "vec_b", "cos")))
    assert(nd.filter(col("cos") < ann.Ann.NearDupCos).count() == 0)
  }

  test("resize and frame sampling: row shapes and fan-out") {
    val payloads = Multimodal.payloads(spark, dir)
    val n = payloads.count()
    val resized = Multimodal.resize(payloads, 128, 96).toDF()
    assert(resized.count() == n)
    assert(resized.filter(col("width") =!= 128 || col("height") =!= 96).count() == 0)
    val frames = Multimodal.sampleFrames(payloads, 3).toDF()
    assert(frames.count() == 3 * n)
    assert(frames.groupBy("doc_id").count().filter(col("count") =!= 3).count() == 0)
  }

  test("WAV: synthesized payloads decode to the parameters the builder embedded") {
    val wavs = Multimodal.wavPayloads(spark, dir).cache()
    val meta = Multimodal.decodeWav(wavs).toDF().cache()
    assert(meta.count() == wavs.count()) // every payload well-formed
    // builder embeds rate = 8000*(1 + id%3) and frames = 64 + id%64
    val bad = meta.filter(
      col("sample_rate") =!= (lit(8000) * (col("doc_id") % 3 + 1)).cast("int")
        || col("n_frames") =!= (col("doc_id") % 64 + 64).cast("int")
        || col("channels") =!= 1 || col("bits_per_sample") =!= 16)
    assert(bad.count() == 0)
    // duration consistent with rate and frames
    val offDur = meta.filter(
      abs(col("duration_ms") - col("n_frames") * 1000.0 / col("sample_rate")) > 1e-9)
    assert(offDur.count() == 0)
    assert(meta.filter(col("rms") <= 0.0).count() == 0)
  }

  test("WAV: the JDK's own javax.sound reader agrees with our parser") {
    val sample = Multimodal.wavPayloads(spark, dir).limit(20).collect()
    sample.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val ours = Multimodal.parseWav(id, bytes).get
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val f = aff.getFormat
      assert(f.getSampleRate.toInt == ours.sample_rate)
      assert(f.getChannels == ours.channels)
      assert(f.getSampleSizeInBits == ours.bits_per_sample)
      assert(aff.getFrameLength == ours.n_frames)
    }
  }

  test("WAV: malformed payloads drop, chunk-order and padding variants parse") {
    val good = Multimodal.wavPayloads(spark, dir).limit(1).collect()(0).getAs[Array[Byte]](1)
    assert(Multimodal.parseWav(1L, good).isDefined)
    // truncated, wrong magic, non-PCM → None, never an exception
    assert(Multimodal.parseWav(1L, good.take(20)).isEmpty)
    val wrongMagic = good.clone(); wrongMagic(0) = 'X'.toByte
    assert(Multimodal.parseWav(1L, wrongMagic).isEmpty)
    val nonPcm = good.clone(); nonPcm(20) = 3 // audio format != 1
    assert(Multimodal.parseWav(1L, nonPcm).isEmpty)
    // an unknown odd-length chunk before fmt must be skipped with padding
    val extra = java.nio.ByteBuffer.allocate(good.length + 8 + 3 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(good, 0, 12) // RIFF....WAVE
    extra.put("LIST".getBytes("US-ASCII")).putInt(3).put(Array[Byte](1, 2, 3, 0))
    extra.put(good, 12, good.length - 12)
    val withChunk = extra.array()
    // fix riff size to cover the insertion
    java.nio.ByteBuffer.wrap(withChunk).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, withChunk.length - 8)
    val parsed = Multimodal.parseWav(1L, withChunk)
    assert(parsed.isDefined && parsed.get.n_frames == Multimodal.parseWav(1L, good).get.n_frames)
  }

  test("q30: metadata stays in envelope (format known, dims in [64, 319])") {
    val df = Multimodal.multimodalMeta(spark, dir).cache()
    assert(df.filter(!col("format").isin(Multimodal.Formats.map(lit(_)): _*)).count() == 0)
    assert(df.filter(col("width") < 64 || col("width") > 319
      || col("height") < 64 || col("height") > 319).count() == 0)
  }

  test("PNG: decoder agrees with the JDK's own javax.imageio reader byte-for-byte") {
    val payloads = Multimodal.pngPayloads(spark, dir)
    val decoded = Multimodal.decodePng(payloads).collect()
      .map(m => m.doc_id -> m).toMap
    val raw = payloads.collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(raw.nonEmpty && decoded.size == raw.length, "every payload must decode")
    raw.foreach { case (id, bytes) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"JDK reader rejected doc $id's PNG")
      val m = decoded(id)
      assert(img.getWidth == m.width && img.getHeight == m.height)
      assert(m.bit_depth == 8 && m.color_type == 2)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
      }
      val n = img.getWidth.toLong * img.getHeight
      assert(m.mean_r == sr.toDouble / n && m.mean_g == sg.toDouble / n
        && m.mean_b == sb.toDouble / n, s"channel means differ for doc $id")
    }
  }

  test("PNG: corrupt, truncated, and unsupported payloads drop the row, not the job") {
    import spark.implicits._
    val good = Multimodal.buildPng(9L,
      java.security.MessageDigest.getInstance("MD5").digest("x".getBytes("UTF-8")))
    assert(Multimodal.parsePng(9L, good).isDefined)
    assert(Multimodal.parsePng(9L, Array.fill[Byte](40)(0x11)).isEmpty) // bad magic
    assert(Multimodal.parsePng(9L, good.take(30)).isEmpty) // truncated mid-IHDR
    // flip one byte inside the first IDAT payload: CRC must catch it
    val corrupt = good.clone()
    corrupt(8 + 25 + 12) = (corrupt(8 + 25 + 12) ^ 0x7F).toByte
    assert(Multimodal.parsePng(9L, corrupt).isEmpty)
    // interlaced flag set (with CRC fixed up): unsupported layout
    val inter = good.clone()
    inter(8 + 8 + 12) = 1 // IHDR interlace byte
    val crc = new java.util.zip.CRC32()
    crc.update(inter, 8 + 4, 4 + 13)
    java.nio.ByteBuffer.wrap(inter).putInt(8 + 8 + 13, crc.getValue.toInt)
    assert(Multimodal.parsePng(9L, inter).isEmpty)
    // a frame with one poison row still decodes the rest
    val withBad = Multimodal.pngPayloads(Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"))
      .union(Seq((99L, Array.fill[Byte](80)(0x00))).toDF("doc_id", "payload"))
    assert(Multimodal.decodePng(withBad).count() == 2)
    // IDAT that inflates to MORE than IHDR declares (valid CRCs): the
    // declared geometry is exact — excess must reject, not truncate
    def tinyPng(rawLen: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      def chunk(typ: String, data: Array[Byte]): Unit = {
        out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array())
        val tb = typ.getBytes("US-ASCII")
        out.write(tb); out.write(data)
        val c = new java.util.zip.CRC32(); c.update(tb); c.update(data)
        out.write(java.nio.ByteBuffer.allocate(4).putInt(c.getValue.toInt).array())
      }
      chunk("IHDR", java.nio.ByteBuffer.allocate(13) // 2x2 RGB: 14 raw bytes
        .putInt(2).putInt(2).put(8.toByte).put(2.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array())
      val d = new java.util.zip.Deflater()
      d.setInput(new Array[Byte](rawLen)); d.finish() // zeros: filter type 0
      val z = new java.io.ByteArrayOutputStream(); val tmp = new Array[Byte](256)
      while (!d.finished()) z.write(tmp, 0, d.deflate(tmp))
      d.end(); chunk("IDAT", z.toByteArray); chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }
    assert(Multimodal.parsePng(7L, tinyPng(14)).isDefined) // exact: accepted
    assert(Multimodal.parsePng(7L, tinyPng(20)).isEmpty)   // 6 excess bytes
  }

  test("BMP: decoder agrees with the JDK's own javax.imageio reader byte-for-byte") {
    val payloads = Multimodal.bmpPayloads(spark, dir)
    val decoded = Multimodal.decodeBmp(payloads).collect()
      .map(m => m.doc_id -> m).toMap
    val raw = payloads.collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(raw.nonEmpty && decoded.size == raw.length, "every payload must decode")
    raw.foreach { case (id, bytes) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"JDK reader rejected doc $id's BMP")
      val m = decoded(id)
      assert(img.getWidth == m.width && img.getHeight == m.height)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
      }
      val n = img.getWidth.toLong * img.getHeight
      assert(m.mean_r == sr.toDouble / n && m.mean_g == sg.toDouble / n
        && m.mean_b == sb.toDouble / n, s"channel means differ for doc $id")
    }
  }

  test("BMP: malformed payloads drop the row, never the job") {
    import spark.implicits._
    assert(Multimodal.parseBmp(1L, Array.fill[Byte](10)(0x42)).isEmpty) // too short
    assert(Multimodal.parseBmp(1L, Array.fill[Byte](100)(0x42)).isEmpty) // wrong magic
    val good = Multimodal.bmpPayloads(Seq((5L, "hello world")).toDF("doc_id", "text"))
      .head.getAs[Array[Byte]]("payload")
    assert(Multimodal.parseBmp(5L, good).isDefined)
    assert(Multimodal.parseBmp(5L, good.take(53)).isEmpty) // truncated header
    val rle = good.clone(); rle(30) = 1 // compression = BI_RLE8
    assert(Multimodal.parseBmp(5L, rle).isEmpty)
    val trunc = good.clone().take(60) // header intact, pixel data missing
    assert(Multimodal.parseBmp(5L, trunc).isEmpty)
    // crafted huge width: rowSize would wrap negative as an Int and
    // bypass the fit check — must reject, not crash the pixel walk
    val wide = good.clone()
    java.nio.ByteBuffer.wrap(wide).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, 800000000)
    assert(Multimodal.parseBmp(5L, wide).isEmpty)
    // height = Int.MinValue: abs() is still negative — must reject, not
    // emit a garbage "decoded" row
    val minH = good.clone()
    java.nio.ByteBuffer.wrap(minH).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, Int.MinValue)
    assert(Multimodal.parseBmp(5L, minH).isEmpty)
    // a frame with one poison row still decodes the rest
    val mixed = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val withBad = Multimodal.bmpPayloads(mixed)
      .union(Seq((99L, Array.fill[Byte](80)(0x00))).toDF("doc_id", "payload"))
    assert(Multimodal.decodeBmp(withBad).count() == 2)
  }

  test("GIF decode: byte-identical channel means vs javax.imageio on the same bytes") {
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, "beta gamma"), (15L, "delta"),
      (40L, "x y z"), (123L, "longer text with many words here"))
      .toDF("doc_id", "text")
    val payloads = Multimodal.gifPayloads(docs).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    payloads.foreach { case (id, bytes) =>
      val ours = Multimodal.parseGif(id, bytes)
        .getOrElse(fail(s"doc $id failed to parse"))
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ours.width == ref.getWidth && ours.height == ref.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until ref.getHeight; x <- 0 until ref.getWidth) {
        val c = ref.getRGB(x, y)
        sr += (c >> 16) & 0xFF; sg += (c >> 8) & 0xFF; sb += c & 0xFF
      }
      val n = (ref.getWidth * ref.getHeight).toDouble
      assert(ours.mean_r == sr / n, s"doc $id R")
      assert(ours.mean_g == sg / n, s"doc $id G")
      assert(ours.mean_b == sb / n, s"doc $id B")
    }
    // distributed decode covers the corpus; malformed rows drop
    val corpus = Multimodal.gifPayloads(spark, dir)
    val withBad = corpus.limit(5)
      .union(Seq((99L, "NOTAGIF".getBytes)).toDF("doc_id", "payload"))
    assert(Multimodal.decodeGif(withBad).count() == 5)
    val trunc = payloads.head._2.take(40)
    assert(Multimodal.parseGif(1L, trunc).isEmpty)
  }

  test("GIF decode: frame smaller than logical screen keeps dims and means consistent") {
    import spark.implicits._
    val docs = Seq((7L, "frame vs screen")).toDF("doc_id", "text")
    val (id, bytes) = Multimodal.gifPayloads(docs).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).head
    val base = Multimodal.parseGif(id, bytes).get
    // enlarge the logical screen descriptor (bytes 6..9, LE u16) so the
    // first frame covers only part of the canvas — a valid GIF shape
    // the JDK writer never emits (it always writes frame == screen)
    val patched = bytes.clone()
    val (sw, sh) = (base.width + 5, base.height + 3)
    patched(6) = (sw & 0xFF).toByte; patched(7) = ((sw >> 8) & 0xFF).toByte
    patched(8) = (sh & 0xFF).toByte; patched(9) = ((sh >> 8) & 0xFF).toByte
    val got = Multimodal.parseGif(id, patched).get
    // width/height stay the frame (pixel-grid) dims the means were
    // computed over; the enlarged canvas is reported separately
    assert(got.width == base.width && got.height == base.height)
    assert(got.screen_width == sw && got.screen_height == sh)
    assert(got.mean_r == base.mean_r && got.mean_g == base.mean_g &&
      got.mean_b == base.mean_b)
  }

  test("JPEG metadata scan: dims/components agree with ImageIO, no entropy decode") {
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, "beta gamma"), (15L, "delta"),
      (123L, "longer text with many words here")).toDF("doc_id", "text")
    val payloads = Multimodal.jpegPayloads(docs).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    payloads.foreach { case (id, bytes) =>
      val ours = Multimodal.parseJpegMeta(id, bytes)
        .getOrElse(fail(s"doc $id failed to parse"))
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ours.width == ref.getWidth && ours.height == ref.getHeight)
      assert(ours.n_components == 3 && ours.bits == 8)
      // the JDK writer emits baseline (SOF0) JPEGs without EXIF
      assert(!ours.progressive && !ours.has_exif)
    }
    // the parser reads ONLY marker headers: truncating the stream right
    // after the SOF segment must still succeed (entropy bytes untouched)
    val (id0, b0) = payloads.head
    val sofEnd = {
      var pos = 2; var end = -1
      while (end < 0 && pos + 4 <= b0.length) {
        val m = b0(pos + 1) & 0xFF
        val len = ((b0(pos + 2) & 0xFF) << 8) | (b0(pos + 3) & 0xFF)
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC)
          end = pos + 2 + len
        else pos += 2 + len
      }
      end
    }
    assert(sofEnd > 0)
    assert(Multimodal.parseJpegMeta(id0, b0.take(sofEnd)).nonEmpty)
    // malformed payloads drop the row, never the job
    val corpus = Multimodal.jpegPayloads(spark, dir).limit(5)
      .union(Seq((99L, "NOTAJPEG".getBytes)).toDF("doc_id", "payload"))
    assert(Multimodal.decodeJpegMeta(corpus).count() == 5)
    assert(Multimodal.parseJpegMeta(1L, b0.take(3)).isEmpty)
  }

  test("mixed-format triage: sniff routes every payload to the right parser") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).limit(40)
    val mixed = Multimodal.mixedImagePayloads(docs)
      .union(Seq((999L, "NOTANIMAGE".getBytes)).toDF("doc_id", "payload"))
    val got = Multimodal.decodeImageMeta(mixed).collect()
      .map(m => m.doc_id -> m).toMap
    assert(got.size == 40) // the junk row dropped, nothing else
    got.values.foreach { m =>
      // format must agree with the builder's doc_id % 4 routing
      val want = Seq("bmp", "png", "gif", "jpeg")(Math.floorMod(m.doc_id, 4).toInt)
      assert(m.format == want, s"doc ${m.doc_id}: ${m.format} != $want")
      // dims must match the specific builder's doc_id recipe
      val (ww, wh) =
        if (m.format == "gif" || m.format == "jpeg")
          (8 + Math.floorMod(m.doc_id, 24).toInt, 8 + Math.floorMod(m.doc_id / 7, 24).toInt)
        else
          (4 + Math.floorMod(m.doc_id, 13).toInt, 3 + Math.floorMod(m.doc_id, 7).toInt)
      assert(m.width == ww && m.height == wh,
        s"doc ${m.doc_id} ${m.format}: ${m.width}x${m.height} != ${ww}x$wh")
    }
    // a WAV container is sniffed but correctly NOT an image
    val wav = Multimodal.wavPayloads(docs.limit(1))
    assert(Multimodal.decodeImageMeta(wav).count() == 0)
  }

  test("audio features: pure tones land on analytic ZCR and spectral centroid") {
    import spark.implicits._
    // 16-bit mono sine exactly on a DFT bin (f = k·rate/N): no leakage,
    // so the centroid must land on the tone and ZCR on 2f/rate —
    // ground truth is physics, not a second implementation
    def sineWav(rate: Int, freq: Double, nFrames: Int): Array[Byte] = {
      val dataLen = nFrames * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      (0 until nFrames).foreach { t =>
        buf.putShort((20000 * math.sin(2 * math.Pi * freq * t / rate)).toShort)
      }
      buf.array()
    }
    val rate = 8000
    val f1 = 56 * rate.toDouble / Multimodal.DftN   // 437.5 Hz, bin 56
    val f2 = 200 * rate.toDouble / Multimodal.DftN  // 1562.5 Hz, bin 200
    val payloads = Seq(
      (1L, sineWav(rate, f1, 1024)), (2L, sineWav(rate, f2, 1024)))
      .toDF("doc_id", "payload")
    val got = Multimodal.audioFeatures(payloads).collect()
      .map(a => a.doc_id -> a).toMap
    assert(math.abs(got(1L).centroid_hz - f1) < 5.0, got(1L))
    assert(math.abs(got(2L).centroid_hz - f2) < 5.0, got(2L))
    assert(math.abs(got(1L).zcr - 2 * f1 / rate) < 0.01)
    assert(math.abs(got(2L).zcr - 2 * f2 / rate) < 0.01)
    // malformed payloads drop, real corpus payloads all decode
    val withBad = payloads
      .union(Seq((9L, Array.fill[Byte](30)(1))).toDF("doc_id", "payload"))
    assert(Multimodal.audioFeatures(withBad).count() == 2)
    val corpus = Multimodal.wavPayloads(spark, dir)
    assert(Multimodal.audioFeatures(corpus).count() == corpus.count())
  }

  test("registered q255: every doc decodes, and the RMS matches the" +
    " cycled-square identity the oracle twin relies on") {
    val rows = Multimodal.wavDecodeAudit(spark, dir).collect()
    val nDocs = Tables.documents(spark, dir).count()
    assert(rows.length.toLong == nDocs) // zero parser drops on valid payloads
    val byId = rows.map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap
    val docs = Tables.documents(spark, dir)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.take(5).foreach { case (id, text) =>
      val h = functions.Hashing.md5hex(text)
      val s = (0 until 16).map(i =>
        ((Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16) - 128) * 256).toLong)
      val nf = 64 + Math.floorMod(id, 64).toInt
      val ssq = (nf / 16) * s.map(v => v * v).sum +
        (0 until nf % 16).map(i => s(i) * s(i)).sum
      val want = BigDecimal(math.sqrt(ssq.toDouble / nf))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val r = byId(id)
      assert(r.getDouble(r.fieldIndex("rms")) == want, s"doc $id")
      assert(r.getInt(r.fieldIndex("sample_rate")) ==
        8000 * (1 + Math.floorMod(id, 3).toInt))
    }
  }
}
