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
