package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import multimodal.{Jpeg, Multimodal}

/** The general baseline JPEG decoder (q258's engine) — three contracts:
  *
  *  1. REAL-WORLD GENERALITY: it decodes the JDK ImageIO writer's own
  *     baseline JPEGs ([[Multimodal.jpegPayloads]]: 4:2:0 subsampling,
  *     writer-chosen quant/Huffman tables, odd dims ⇒ partial-MCU
  *     crop + replication upsample) and its per-channel means agree
  *     with ImageIO's OWN decoder within a small IDCT-rounding band —
  *     two independent decoders, one of them libjpeg-lineage.
  *  2. The coefficient-pinned corpus (q258's payloads) decodes with NO
  *     dropped rows and the pinned geometry. (VALUE-correctness is the
  *     driver gate's job — the DuckDB twin recomputes every pixel.)
  *  3. Malformed payloads drop rows, never jobs.
  */
class JpegSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("ImageIO-written 4:2:0 JPEGs: means agree with ImageIO's own decoder") {
    val payloads = Multimodal.jpegPayloads(spark, dir)
      .limit(40).collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(payloads.length == 40)
    var checked = 0
    payloads.foreach { case (id, bytes) =>
      val ours = Jpeg.parseJpegPixels(id, bytes)
      assert(ours.isDefined, s"doc $id: decoder dropped an ImageIO JPEG")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val (w, h) = (img.getWidth, img.getHeight)
      assert(ours.get.width == w && ours.get.height == h, s"doc $id geometry")
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
      }
      val n = (w * h).toDouble
      // IDCT/upsample implementations differ (ours: exact double IDCT +
      // replication upsample; JDK: libjpeg-lineage fast paths + smooth
      // upsample), so means agree within a band, not bitwise
      assert(math.abs(ours.get.mean_r - sr / n) <= 3.0, s"doc $id mean_r")
      assert(math.abs(ours.get.mean_g - sg / n) <= 3.0, s"doc $id mean_g")
      assert(math.abs(ours.get.mean_b - sb / n) <= 3.0, s"doc $id mean_b")
      checked += 1
    }
    info(s"cross-checked $checked ImageIO JPEGs against the JDK decoder")
  }

  test("coefficient-pinned corpus: zero dropped rows, pinned geometry") {
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    val out = Jpeg.decodeJpegPixels(Jpeg.jpegCoefPayloads(docs)).toDF().cache()
    assert(out.count() == n, "a synthesized payload failed to decode")
    val badGeo = out.filter(
      col("width") =!= lit(8) * (lit(1) + col("doc_id") % 3) ||
      col("height") =!= lit(8) * (lit(1) + col("doc_id") % 2)).count()
    assert(badGeo == 0)
    // means are real pixel statistics, not degenerate constants
    assert(out.select(countDistinct(col("mean_r"))).head.getLong(0) > n / 2)
    out.unpersist()
  }

  test("progressive ≡ baseline: same coefficients, bitwise-identical pixels") {
    // the two scan scripts carry identical quantized coefficients, so
    // the decoded stats must agree EXACTLY — any successive-
    // approximation bit slip shifts a coefficient and breaks this
    val docs = Tables.documents(spark, dir)
    val base = Jpeg.decodeJpegPixels(Jpeg.jpegCoefPayloads(docs)).collect()
      .map(p => p.doc_id -> p).toMap
    val prog = Jpeg.decodeJpegPixels(Jpeg.jpegProgPayloads(docs)).collect()
    assert(prog.length == base.size, "a progressive payload failed to decode")
    prog.foreach { p => assert(p == base(p.doc_id), s"doc ${p.doc_id} differs") }
  }

  test("progressive payloads: the JDK's independent decoder agrees") {
    // ImageIO is libjpeg-lineage and decodes progressive JPEG — a
    // decoder-independent check that the SOF2 streams are well-formed
    // and carry the pixels we think (band, not bitwise: IDCT paths
    // differ)
    val payloads = Jpeg.jpegProgPayloads(Tables.documents(spark, dir))
      .limit(40).collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    var checked = 0
    payloads.foreach { case (id, bytes) =>
      val ours = Jpeg.parseJpegPixels(id, bytes)
      assert(ours.isDefined, s"doc $id: progressive payload dropped")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"doc $id: ImageIO rejected the SOF2 stream")
      val (w, h) = (img.getWidth, img.getHeight)
      assert(ours.get.width == w && ours.get.height == h, s"doc $id geometry")
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
      }
      val n = (w * h).toDouble
      assert(math.abs(ours.get.mean_r - sr / n) <= 3.0, s"doc $id mean_r")
      assert(math.abs(ours.get.mean_g - sg / n) <= 3.0, s"doc $id mean_g")
      assert(math.abs(ours.get.mean_b - sb / n) <= 3.0, s"doc $id mean_b")
      checked += 1
    }
    info(s"cross-checked $checked progressive JPEGs against the JDK decoder")
  }

  test("AC-refinement ZRL with interleaved correction bits: JDK decoder agrees (r16 advice)") {
    // The registered CoefZz corpus never produces run > 15 in the
    // refinement scans, so this path was unreachable until now. The
    // planted block forces exactly the bit-order trap the advice
    // described: z1 history-nonzero (|v| > 1), 16 zero-history slots,
    // z18 history-nonzero whose correction bit must ride the NEXT
    // symbol (not flush with the ZRL that covers the zeros), z19
    // newly significant (|v| = 1) — libjpeg order is
    // ZRL, [z1 bit], (0,1) symbol, sign, [z18 bit]; the pre-fix
    // encoder emitted z18's bit before the symbol, which an
    // independent decoder reads as Huffman code bits. Also reaches
    // run 9–15 ((r,s) codes the old 7-bit table lacked).
    val coef: (Int, Int, Int) => Int = (_, _, z) => z match {
      case 0 => 3; case 1 => 4; case 18 => 6; case 19 => 1; case _ => 0
    }
    for (id <- 0L to 5L) { // all fixture geometries (1–3 × 1–2 blocks)
      val bytes = Jpeg.buildCoefJpegProgressive(id,
        Array.tabulate(16)(i => (i * 13).toByte), Some(coef))
      val ours = Jpeg.parseJpegPixels(id, bytes)
      assert(ours.isDefined, s"id $id: wide-run progressive payload dropped")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"id $id: ImageIO rejected the wide-run stream")
      val (w, h) = (img.getWidth, img.getHeight)
      assert(ours.get.width == w && ours.get.height == h, s"id $id geometry")
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
      }
      val n = (w * h).toDouble
      assert(math.abs(ours.get.mean_r - sr / n) <= 3.0, s"id $id mean_r")
      assert(math.abs(ours.get.mean_g - sg / n) <= 3.0, s"id $id mean_g")
      assert(math.abs(ours.get.mean_b - sb / n) <= 3.0, s"id $id mean_b")
    }
  }

  test("malformed payloads drop rows, never the job") {
    import spark.implicits._
    val good = Jpeg.buildCoefJpeg(7L, Array.tabulate(16)(i => (i * 17).toByte))
    val cases = Seq(
      (1L, Array[Byte](0x12, 0x34)),                      // not a JPEG
      (2L, good.take(20)),                                // truncated in headers
      (3L, good.take(good.length - 30)),                  // truncated entropy data
      (4L, good.updated(2, 0x00.toByte)),                 // broken marker chain
      (5L, Array.fill[Byte](64)(0xFF.toByte)),            // marker soup
      (6L, good)                                          // control: decodes
    ).toDF("doc_id", "payload")
    val out = Jpeg.decodeJpegPixels(cases).collect()
    assert(out.map(_.doc_id).toSet == Set(6L))
  }

  test("process classifier: baseline / progressive / other / malformed routing") {
    val dig = Array.tabulate(16)(i => (i * 31).toByte)
    assert(Jpeg.jpegProcessClass(Jpeg.buildCoefJpeg(3L, dig)) == "baseline")
    assert(Jpeg.jpegProcessClass(Jpeg.buildCoefJpegProgressive(3L, dig)) == "progressive")
    assert(Jpeg.jpegProcessClass(Jpeg.buildSof3Stub(3L)) == "other")
    assert(Jpeg.jpegProcessClass(Array[Byte](0x12, 0x34)) == "malformed")
    assert(Jpeg.jpegProcessClass(Jpeg.buildCoefJpeg(3L, dig).take(4)) == "malformed")
    // the unsupported process is dropped by the decoder, not crashed on
    assert(Jpeg.parseJpegPixels(3L, Jpeg.buildSof3Stub(3L)).isEmpty)
  }

  test("DC-only flat block decodes to the closed-form constant") {
    // digest of all-zero bytes: every coefficient byte is 0 →
    // value (0 % 64) − 32 = −32 for DC and all three ACs
    val dig = new Array[Byte](16)
    val bytes = Jpeg.buildCoefJpeg(0L, dig) // 8×8: one MCU
    val out = Jpeg.parseJpegPixels(0L, bytes).get
    assert(out.width == 8 && out.height == 8)
    // decode is deterministic: re-parse is identical
    assert(Jpeg.parseJpegPixels(0L, bytes).get == out)
  }
}
