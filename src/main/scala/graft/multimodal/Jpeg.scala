package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** REAL baseline-JPEG pixel decode (r14 verdict #4 — the one format
  * [[Multimodal]] stopped at metadata for, while PNG/WAV/BMP/GIF decode
  * pixels). The decoder below is a GENERAL ITU T.81 baseline sequential
  * decoder, JDK-only: marker walk, DQT (both precisions), DHT
  * (canonical Huffman build per F.2.2.3), SOF0, DRI/RSTn, SOS,
  * interleaved-MCU entropy decode with byte unstuffing and per-component
  * DC prediction, dequantization, de-zigzag, direct 2-D double IDCT,
  * level shift + clamp, sampling-factor plane assembly with
  * replication upsampling (4:4:4, 4:2:2 and 4:2:0 all decode), and
  * BT.601 YCbCr→RGB. JpegSpec cross-checks it against the JDK's own
  * ImageIO decoder on the ImageIO-written [[Multimodal.jpegPayloads]]
  * corpus (4:2:0, Annex-K-style tables, odd dims ⇒ partial-MCU crop).
  *
  * The FULL-HASH gate (q258) needs the decode result to be
  * arithmetically reconstructible in DuckDB, and JPEG's forward DCT is
  * lossy — so the audited payloads come from [[jpegCoefPayloads]],
  * which synthesizes the QUANTIZED COEFFICIENTS directly from
  * md5(text) bytes (the q238 doctrine: the builder pins known content,
  * the decoder under test is the real general parser). Four
  * coefficients per block — DC plus ACs at zigzag 1/5/9 — keep the
  * oracle's per-pixel IDCT a 4-term sum; every other coefficient is a
  * true zero, which contributes an exact ±0.0 to the decoder's 64-term
  * fold, so the two sums are IEEE-identical term for term. The IDCT
  * cosine table is computed ONCE here and embedded in the oracle as
  * round-tripping double literals; sums/products mirror textually
  * (left association), rounding is floor(x + 0.5) on both engines
  * (Math.round half-up vs SQL round half-away differ on negatives).
  *
  * Reference: n/a (multimodal is brief-mandated; the reference ETL at
  * julestucher/mcas-question2-etl has no media surface). Public spec:
  * ITU-T T.81 (JPEG), Annex F (decode), Annex K (example tables).
  */
object Jpeg {

  /** Decoded-pixel stats row (q258). */
  case class JpegPixels(doc_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  // ---- shared IDCT cosine table: ct(u)(x) = α(u)/2 · cos((2x+1)uπ/16) ----
  private[graft] val Ct: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val a = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * a * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** T.81 zigzag order → natural (v·8 + u) index. */
  private[graft] val ZigZag: Array[Int] = {
    val zz = new Array[Int](64)
    var x = 0; var y = 0
    for (i <- 0 until 64) {
      zz(i) = y * 8 + x
      if ((x + y) % 2 == 0) { // moving up-right
        if (x == 7) y += 1 else if (y == 0) x += 1 else { x += 1; y -= 1 }
      } else { // moving down-left
        if (y == 7) x += 1 else if (x == 0) y += 1 else { x -= 1; y += 1 }
      }
    }
    zz
  }

  /** Annex K quantization tables, NATURAL order (DQT emits zigzag). */
  private[graft] val QLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private[graft] val QChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // ---- coefficient-payload geometry & values (shared with the oracle) ----

  /** Zigzag positions carrying data in [[jpegCoefPayloads]] blocks:
    * DC, AC(0,1), AC(0,2), AC(3,0) — natural indexes 0, 1, 2, 24. */
  private[graft] val CoefZz: Array[Int] = Array(0, 1, 5, 9)

  private[graft] def coefWidth(id: Long): Int =
    8 * (1 + Math.floorMod(id, 3)).toInt
  private[graft] def coefHeight(id: Long): Int =
    8 * (1 + Math.floorMod(id, 2)).toInt

  /** Quantized coefficient value for (digest, component, block, k):
    * byte((b + 5c + 3k) mod 16) % 64 − 32 ∈ [−32, 31]. */
  private[graft] def coefVal(dig: Array[Byte], c: Int, b: Int, k: Int): Int =
    ((dig((b + 5 * c + 3 * k) % 16) & 0xFF) % 64) - 32

  // ---- canonical Huffman (encode + decode share the derivation) ----

  /** counts(l−1) = number of codes of bit-length l (1-based l ≤ 16). */
  private final class Huff(val counts: Array[Int], val symbols: Array[Int]) {
    // canonical code per symbol, in symbol-list order (F.2.2.3 tables)
    val codes = new Array[Int](symbols.length)
    val lens = new Array[Int](symbols.length)
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (l <- 1 to 16) {
        valPtr(l) = k
        minCode(l) = code
        for (_ <- 0 until counts(l - 1)) {
          codes(k) = code; lens(k) = l; code += 1; k += 1
        }
        if (counts(l - 1) > 0) maxCode(l) = code - 1
        code <<= 1
      }
    }
    val encode: Map[Int, (Int, Int)] =
      symbols.indices.map(i => symbols(i) -> (codes(i), lens(i))).toMap
  }

  /** Encoder tables: flat fixed-length canonical codes (all-ones code
    * unused per T.81 C.2 as nSymbols < 2^L). The DECODER never assumes
    * this shape — it builds whatever canonical table the DHT carries
    * (JpegSpec drives it over ImageIO's Annex-K-style tables too). */
  private val EncDcSyms = (0 to 8).toArray            // DC categories 0..8
  private val EncAcSyms =                              // EOB + (run ≤ 8, size ≤ 6)
    0 +: (for (r <- 0 to 8; s <- 1 to 6) yield (r << 4) | s).toArray
  private def flatCounts(n: Int, len: Int): Array[Int] = {
    val c = new Array[Int](16); c(len - 1) = n; c
  }
  private val EncDc = new Huff(flatCounts(EncDcSyms.length, 4), EncDcSyms)
  private val EncAc = new Huff(flatCounts(EncAcSyms.length, 7), EncAcSyms)
  /** Progressive AC table over the FULL T.81 symbol range (r16 advice:
    * the old 7-bit table stopped at run 8 / size 6 / EOB-run nbits 8 —
    * adequate for the registered fixture geometry but a latent
    * Huff.encode throw if it ever widened): EOB-run classes
    * (nbits<<4 for nbits ≤ 14, the eobrun ≤ 32767 ceiling) — which
    * double as the (r, s=0) codes the sequential table never uses —
    * every (run ≤ 15, size ≤ 10) pair (size ≤ 10 covers any 8-bit
    * precision quantized AC magnitude), and ZRL. 176 symbols → flat
    * 8-bit codes (< 255, the all-ones JPEG reservation holds). */
  private val EncAcProgSyms: Array[Int] =
    ((0 to 14).map(_ << 4) ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s) ++ Seq(0xF0)).toArray
  private val EncAcProg = new Huff(flatCounts(EncAcProgSyms.length, 8), EncAcProgSyms)

  // ---- bit IO ----

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0; private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1); n += 1
        if (n == 8) {
          out.write(buf)
          if (buf == 0xFF) out.write(0x00) // stuffing
          buf = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { // pad with 1s
      buf = (buf << (8 - n)) | ((1 << (8 - n)) - 1)
      out.write(buf)
      if (buf == 0xFF) out.write(0x00)
      buf = 0; n = 0
    }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var buf = 0; private var n = 0
    def resetBits(): Unit = { buf = 0; n = 0 }
    def bit(): Int = {
      if (n == 0) {
        if (pos >= bytes.length) sys.error("entropy eof")
        var b = bytes(pos) & 0xFF; pos += 1
        if (b == 0xFF) {
          val b2 = if (pos < bytes.length) bytes(pos) & 0xFF else -1
          if (b2 == 0x00) pos += 1
          else sys.error("marker in entropy data") // caller handles RST before
        }
        buf = b; n = 8
      }
      n -= 1
      (buf >> n) & 1
    }
    def bits(k: Int): Int = { var v = 0; var i = 0; while (i < k) { v = (v << 1) | bit(); i += 1 }; v }
    def huff(t: Huff): Int = {
      var code = bit(); var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.symbols(t.valPtr(l) + code - t.minCode(l))
        code = (code << 1) | bit(); l += 1
      }
      sys.error("bad huffman code")
    }
  }

  /** EXTEND (T.81 F.2.2.1): map magnitude bits to a signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def bitLen(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v)

  // ---- the coefficient-level payload builder ----

  /** One REAL baseline JFIF JPEG per document, its quantized
    * coefficients synthesized from md5(text) ([[coefVal]]): SOI, APP0,
    * two Annex-K DQTs (zigzag order, as the spec requires), SOF0
    * (8-bit, 3 components, 4:4:4), four DHTs (canonical), SOS, real
    * Huffman-coded entropy data with DC prediction, byte stuffing and
    * 1-padding, EOI. Dims are multiples of 8 (no partial MCUs), so the
    * oracle's pixel grid is exactly the decoder's. */
  def jpegCoefPayloads(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          md.reset()
          (id, buildCoefJpeg(id, md.digest(text.getBytes("UTF-8"))))
        }
      }.toDF("doc_id", "payload")
  }

  def jpegCoefPayloads(spark: SparkSession, dir: String): DataFrame =
    jpegCoefPayloads(Tables.documents(spark, dir))

  private[graft] def buildCoefJpeg(id: Long, dig: Array[Byte]): Array[Byte] = {
    val w = coefWidth(id); val h = coefHeight(id)
    val bw = w / 8; val bh = h / 8
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    marker(0xD8) // SOI
    marker(0xE0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    def dqt(tq: Int, q: Array[Int]): Unit = {
      marker(0xDB); u16(2 + 1 + 64); u8(tq)
      ZigZag.foreach(nat => u8(q(nat)))
    }
    dqt(0, QLuma); dqt(1, QChroma)
    marker(0xC0); u16(8 + 3 * 3) // SOF0
    u8(8); u16(h); u16(w); u8(3)
    for (c <- 0 until 3) { u8(c + 1); u8(0x11); u8(if (c == 0) 0 else 1) }
    def dht(tcTh: Int, t: Huff): Unit = {
      marker(0xC4); u16(2 + 1 + 16 + t.symbols.length); u8(tcTh)
      t.counts.foreach(u8); t.symbols.foreach(u8)
    }
    dht(0x00, EncDc); dht(0x10, EncAc) // tables 0 (Y)
    dht(0x01, EncDc); dht(0x11, EncAc) // tables 1 (Cb/Cr)
    marker(0xDA); u16(6 + 2 * 3) // SOS
    u8(3)
    for (c <- 0 until 3) { u8(c + 1); u8(if (c == 0) 0x00 else 0x11) }
    u8(0); u8(63); u8(0)
    val bwr = new BitWriter(out)
    def putVal(t: Huff, sym: Int, v: Int, size: Int): Unit = {
      val (code, len) = t.encode(sym)
      bwr.put(code, len)
      if (size > 0) bwr.put(if (v < 0) v + (1 << size) - 1 else v, size)
    }
    val pred = new Array[Int](3)
    for (b <- 0 until bw * bh; c <- 0 until 3) {
      val blk = new Array[Int](64) // zigzag-order quantized coefficients
      for (k <- CoefZz.indices) blk(CoefZz(k)) = coefVal(dig, c, b, k)
      val diff = blk(0) - pred(c); pred(c) = blk(0)
      val t = bitLen(math.abs(diff))
      putVal(EncDc, t, diff, t)
      var run = 0
      for (z <- 1 until 64) {
        if (blk(z) == 0) run += 1
        else {
          while (run > 15) { putVal(EncAc, 0xF0, 0, 0); run -= 16 }
          val s = bitLen(math.abs(blk(z)))
          putVal(EncAc, (run << 4) | s, blk(z), s)
          run = 0
        }
      }
      if (run > 0) putVal(EncAc, 0x00, 0, 0) // EOB
    }
    bwr.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** One REAL progressive JPEG (SOF2) per document with the SAME
    * quantized coefficients as [[buildCoefJpeg]] ([[coefVal]]), coded
    * through a full successive-approximation scan script (T.81 G.1.2):
    * interleaved DC first (Al=1) → DC refinement (raw bits) → per-
    * component AC first scans (Ss=1..63, Al=1, EOB-run accumulation
    * ACROSS blocks) → per-component AC refinement scans (Ah=1→Al=0:
    * correction-bit buffering, newly-significant (r<<4)|1 codes, EOB
    * runs carrying the buffered bits — the figure-G.7 machinery).
    * Because the final coefficients are identical, the decoded pixels
    * — and therefore the q317 oracle — are EXACTLY q258's. */
  private[graft] def buildCoefJpegProgressive(id: Long, dig: Array[Byte],
      coefOf: Option[(Int, Int, Int) => Int] = None): Array[Byte] = {
    val w = coefWidth(id); val h = coefHeight(id)
    val bw = w / 8; val bh = h / 8; val nBlocks = bw * bh
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    marker(0xD8) // SOI
    marker(0xE0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    def dqt(tq: Int, q: Array[Int]): Unit = {
      marker(0xDB); u16(2 + 1 + 64); u8(tq)
      ZigZag.foreach(nat => u8(q(nat)))
    }
    dqt(0, QLuma); dqt(1, QChroma)
    marker(0xC2); u16(8 + 3 * 3) // SOF2: progressive DCT, Huffman
    u8(8); u16(h); u16(w); u8(3)
    for (c <- 0 until 3) { u8(c + 1); u8(0x11); u8(if (c == 0) 0 else 1) }
    def dht(tcTh: Int, t: Huff): Unit = {
      marker(0xC4); u16(2 + 1 + 16 + t.symbols.length); u8(tcTh)
      t.counts.foreach(u8); t.symbols.foreach(u8)
    }
    dht(0x00, EncDc); dht(0x10, EncAcProg)
    dht(0x01, EncDc); dht(0x11, EncAcProg)
    // quantized coefficient value at zigzag slot z for (component,
    // block); `coefOf` overrides the fixture geometry — the JpegSpec
    // hook that reaches the wide-run scan paths (ZRL in refinement,
    // run > 8, size > 6) the registered CoefZz corpus never produces
    def zval(c: Int, b: Int, z: Int): Int = coefOf match {
      case Some(f) => f(c, b, z)
      case None =>
        val k = CoefZz.indexOf(z)
        if (k < 0) 0 else coefVal(dig, c, b, k)
    }
    def sos(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xDA); u16(6 + 2 * comps.length)
      u8(comps.length)
      comps.foreach { c =>
        u8(c + 1); u8(if (c == 0) 0x00 else 0x11)
      }
      u8(ss); u8(se); u8((ah << 4) | al)
    }

    // ---- scan 1: DC first, interleaved, Al = 1 (diffs of v >> 1) ----
    sos(Seq(0, 1, 2), 0, 0, 0, 1)
    locally {
      val bwr = new BitWriter(out)
      val pred = new Array[Int](3)
      def putVal(t: Huff, sym: Int, v: Int, size: Int): Unit = {
        val (code, len) = t.encode(sym)
        bwr.put(code, len)
        if (size > 0) bwr.put(if (v < 0) v + (1 << size) - 1 else v, size)
      }
      for (b <- 0 until nBlocks; c <- 0 until 3) {
        val sv = zval(c, b, 0) >> 1 // arithmetic shift — the DC point transform
        val diff = sv - pred(c); pred(c) = sv
        val t = bitLen(math.abs(diff))
        putVal(EncDc, t, diff, t)
      }
      bwr.flush()
    }

    // ---- scan 2: DC refinement, interleaved, Ah=1 Al=0 (raw bits) ----
    sos(Seq(0, 1, 2), 0, 0, 1, 0)
    locally {
      val bwr = new BitWriter(out)
      for (b <- 0 until nBlocks; c <- 0 until 3)
        bwr.put(zval(c, b, 0) & 1, 1)
      bwr.flush()
    }

    // ---- scans 3–5: AC first per component, Ss=1 Se=63 Al=1 ----
    for (c <- 0 until 3) {
      sos(Seq(c), 1, 63, 0, 1)
      val bwr = new BitWriter(out)
      def putSym(sym: Int): Unit = {
        val (code, len) = EncAcProg.encode(sym); bwr.put(code, len)
      }
      var eobrun = 0
      def flushEob(): Unit = if (eobrun > 0) {
        val nbits = bitLen(eobrun) - 1
        putSym(nbits << 4)
        if (nbits > 0) bwr.put(eobrun - (1 << nbits), nbits)
        eobrun = 0
      }
      for (b <- 0 until nBlocks) {
        // magnitudes at this approximation: |v| >> 1, sign reinstated
        var lastNz = 0
        var z = 1
        while (z < 64) { if (math.abs(zval(c, b, z)) >> 1 != 0) lastNz = z; z += 1 }
        if (lastNz == 0) { eobrun += 1; if (eobrun == 32767) flushEob() }
        else {
          flushEob()
          var run = 0
          z = 1
          while (z <= lastNz) {
            val v = zval(c, b, z)
            val temp = math.abs(v) >> 1
            if (temp == 0) run += 1
            else {
              while (run > 15) { putSym(0xF0); run -= 16 }
              val s = bitLen(temp)
              val sv = if (v < 0) -temp else temp
              putSym((run << 4) | s)
              bwr.put(if (sv < 0) sv + (1 << s) - 1 else sv, s)
              run = 0
            }
            z += 1
          }
          if (lastNz < 63) { eobrun += 1; if (eobrun == 32767) flushEob() }
        }
      }
      flushEob()
      bwr.flush()
    }

    // ---- scans 6–8: AC refinement per component, Ah=1 Al=0 ----
    for (c <- 0 until 3) {
      sos(Seq(c), 1, 63, 1, 0)
      val bwr = new BitWriter(out)
      def putSym(sym: Int): Unit = {
        val (code, len) = EncAcProg.encode(sym); bwr.put(code, len)
      }
      var eobrun = 0
      val beBuf = scala.collection.mutable.ArrayBuffer.empty[Int] // bits riding the EOB run
      def flushEob(): Unit = {
        if (eobrun > 0) {
          val nbits = bitLen(eobrun) - 1
          putSym(nbits << 4)
          if (nbits > 0) bwr.put(eobrun - (1 << nbits), nbits)
          eobrun = 0
        }
        beBuf.foreach(bwr.put(_, 1)); beBuf.clear()
      }
      for (b <- 0 until nBlocks) {
        // EOB index: the LAST newly-significant (|v| == 1) coefficient
        var eobIdx = 0
        var z = 1
        while (z < 64) { if (math.abs(zval(c, b, z)) == 1) eobIdx = z; z += 1 }
        var run = 0
        val brBuf = scala.collection.mutable.ArrayBuffer.empty[Int]
        z = 1
        while (z < 64) {
          val v = zval(c, b, z)
          val temp = math.abs(v)
          if (temp == 0) run += 1
          else {
            // ZRLs are due at EVERY nonzero position once run > 15 —
            // history-nonzero included — so the correction bits
            // buffered SO FAR flush right after the ZRL and bits for
            // coefficients AFTER the covered zeros stay behind the
            // next Huffman symbol (libjpeg's encode_mcu_AC_refine
            // order; the r16 advice finding — deferring the ZRL to
            // the next newly-significant coefficient emitted later
            // correction bits ahead of it, which a decoder would
            // read as code bits)
            while (run > 15 && z <= eobIdx) {
              flushEob(); putSym(0xF0); run -= 16
              brBuf.foreach(bwr.put(_, 1)); brBuf.clear()
            }
            if (temp > 1) brBuf += (temp & 1) // history-nonzero: correction bit
            else { // newly significant
              flushEob()
              putSym((run << 4) | 1)
              bwr.put(if (v >= 0) 1 else 0, 1)
              brBuf.foreach(bwr.put(_, 1)); brBuf.clear()
              run = 0
            }
          }
          z += 1
        }
        if (run > 0 || brBuf.nonEmpty) {
          eobrun += 1; beBuf ++= brBuf
          if (eobrun == 32767) flushEob()
        }
      }
      flushEob()
      bwr.flush()
    }
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ---- the general baseline decoder ----

  private final case class Component(id: Int, hi: Int, vi: Int, tq: Int)

  /** Decode a baseline JPEG to per-channel pixel means. General:
    * arbitrary dims (MCU-padded planes cropped), sampling factors,
    * DHT/DQT multi-table segments, DRI/RSTn, grayscale (ncomp = 1 ⇒
    * R = G = B = Y). Returns None on any malformed stream. */
  private[graft] def parseJpegPixels(id: Long, bytes: Array[Byte]): Option[JpegPixels] =
    try Some(decodeImpl(id, bytes)) catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(id: Long, bytes: Array[Byte]): JpegPixels = {
    def u8(i: Int) = bytes(i) & 0xFF
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    require(bytes.length > 4 && u8(0) == 0xFF && u8(1) == 0xD8, "no SOI")
    var pos = 2
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[Huff](4); val acT = new Array[Huff](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var progressive = false
    var scan: Array[(Int, Int, Int)] = null // (compIdx, dcTbl, acTbl)
    var scanSs = 0; var scanSe = 63; var scanAh = 0; var scanAl = 0
    var entropyStart = -1
    while (entropyStart < 0) {
      require(u8(pos) == 0xFF, "marker misalign")
      var m = u8(pos + 1); var p = pos + 1
      while (m == 0xFF && p + 1 < bytes.length) { p += 1; m = u8(p) }
      pos = p - 1
      m match {
        case 0xD9 => sys.error("EOI before scan")
        case 0xC0 | 0xC1 | 0xC2 => // baseline / ext. sequential / progressive SOF
          progressive = m == 0xC2
          val n = u8(pos + 9)
          require(u8(pos + 4) == 8, "precision != 8")
          h = u16(pos + 5); w = u16(pos + 7)
          require(w > 0 && h > 0 && (n == 1 || n == 3), "bad frame")
          comps = Array.tabulate(n) { i =>
            val o = pos + 10 + 3 * i
            Component(u8(o), u8(o + 1) >> 4, u8(o + 1) & 0xF, u8(o + 2))
          }
          pos += 2 + u16(pos + 2)
        case mm if mm >= 0xC3 && mm <= 0xCF && mm != 0xC4 && mm != 0xC8 && mm != 0xCC =>
          sys.error("unsupported SOF process")
        case 0xC4 => // DHT (possibly several tables)
          val end = pos + 2 + u16(pos + 2)
          var o = pos + 4
          while (o < end) {
            val tcTh = u8(o)
            val counts = Array.tabulate(16)(i => u8(o + 1 + i))
            val nsym = counts.sum
            val syms = Array.tabulate(nsym)(i => u8(o + 17 + i))
            val t = new Huff(counts, syms)
            if (tcTh >> 4 == 0) dcT(tcTh & 0xF) = t else acT(tcTh & 0xF) = t
            o += 17 + nsym
          }
          pos = end
        case 0xDB => // DQT (possibly several tables; pq 0/1)
          val end = pos + 2 + u16(pos + 2)
          var o = pos + 4
          while (o < end) {
            val pq = u8(o) >> 4; val tq = u8(o) & 0xF
            val tbl = new Array[Int](64)
            for (i <- 0 until 64)
              tbl(ZigZag(i)) = if (pq == 0) u8(o + 1 + i) else u16(o + 1 + 2 * i)
            qt(tq) = tbl
            o += 1 + (if (pq == 0) 64 else 128)
          }
          pos = end
        case 0xDD => restartInterval = u16(pos + 4); pos += 2 + u16(pos + 2)
        case 0xDA => // SOS
          val ns = u8(pos + 4)
          scan = Array.tabulate(ns) { i =>
            val o = pos + 5 + 2 * i
            val ci = comps.indexWhere(_.id == u8(o))
            require(ci >= 0, "scan component not in frame")
            (ci, u8(o + 1) >> 4, u8(o + 1) & 0xF)
          }
          val so = pos + 5 + 2 * ns
          scanSs = u8(so); scanSe = u8(so + 1)
          scanAh = u8(so + 2) >> 4; scanAl = u8(so + 2) & 0xF
          entropyStart = pos + 2 + u16(pos + 2)
        case _ =>
          val len = u16(pos + 2)
          require(len >= 2, "bad segment length")
          pos += 2 + len
      }
    }
    require(comps != null && scan != null, "missing SOF/SOS")
    val hmax = comps.map(_.hi).max; val vmax = comps.map(_.vi).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // MCU-padded per-component planes
    val planeW = comps.map(c => mcusX * c.hi * 8)
    val planeH = comps.map(c => mcusY * c.vi * 8)
    val planes = comps.indices.map(i => new Array[Int](planeW(i) * planeH(i))).toArray
    // direct 2-D IDCT of one dequantized natural-order block, ascending
    // natural index — the fold order the q258/q317 oracles mirror (zero
    // coefficients add exact ±0.0); shared by both decode processes
    def idctWrite(blk: Array[Int], ci: Int, px0: Int, py0: Int): Unit = {
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var idx = 0
          while (idx < 64) {
            if (blk(idx) != 0)
              s += blk(idx) * Ct(idx % 8)(x) * Ct(idx / 8)(y)
            idx += 1
          }
          val v = 128.0 + s
          val iv = math.floor(v + 0.5).toInt
          planes(ci)((py0 + y) * planeW(ci) + px0 + x) =
            if (iv < 0) 0 else if (iv > 255) 255 else iv
          x += 1
        }
        y += 1
      }
    }
    if (progressive)
      decodeProgressiveScans(id, bytes, entropyStart, comps, w, h,
        scan, scanSs, scanSe, scanAh, scanAl, restartInterval,
        qt, dcT, acT, mcusX, mcusY, hmax, vmax, planeW, planeH, idctWrite)
    else
      decodeBaselineScan(bytes, entropyStart, comps, scan, restartInterval,
        qt, dcT, acT, mcusX, mcusY, idctWrite)
    renderMeans(id, comps, w, h, planes, planeW, hmax, vmax)
  }

  /** The single baseline (SOF0/SOF1) scan: inline entropy decode,
    * dequantize, IDCT per block. */
  private def decodeBaselineScan(bytes: Array[Byte], entropyStart: Int,
      comps: Array[Component], scan: Array[(Int, Int, Int)],
      restartInterval: Int, qt: Array[Array[Int]],
      dcT: Array[Huff], acT: Array[Huff], mcusX: Int, mcusY: Int,
      idctWrite: (Array[Int], Int, Int, Int) => Unit): Unit = {
    val rdr = new BitReader(bytes, entropyStart)
    val pred = new Array[Int](comps.length)
    val blk = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // RSTn: aligned marker, reset bit phase and DC predictors
        rdr.resetBits()
        var q = rdr.pos
        while (q + 1 < bytes.length && (bytes(q) & 0xFF) == 0xFF &&
          (bytes(q + 1) & 0xFF) >= 0xD0 && (bytes(q + 1) & 0xFF) <= 0xD7) q += 2
        require(q > rdr.pos, "missing RST marker")
        rdr.pos = q
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      for ((ci, dci, aci) <- scan) {
        val c = comps(ci)
        val dq = qt(c.tq); require(dq != null, "missing DQT")
        val dtab = dcT(dci); val atab = acT(aci)
        require(dtab != null && atab != null, "missing DHT")
        for (by <- 0 until c.vi; bx <- 0 until c.hi) {
          java.util.Arrays.fill(blk, 0)
          val t = rdr.huff(dtab)
          pred(ci) += extend(rdr.bits(t), t)
          blk(0) = pred(ci) * dq(0)
          var z = 1
          while (z < 64) {
            val rs = rdr.huff(atab)
            if (rs == 0x00) z = 64 // EOB
            else if (rs == 0xF0) z += 16 // ZRL
            else {
              z += rs >> 4
              require(z < 64, "AC index overflow")
              val s = rs & 0xF
              blk(ZigZag(z)) = extend(rdr.bits(s), s) * dq(ZigZag(z))
              z += 1
            }
          }
          idctWrite(blk, ci, (mx * c.hi + bx) * 8, (my * c.vi + by) * 8)
        }
      }
      mcu += 1
    }
  }

  /** Full-res sampling (replication upsample) + color convert + means —
    * shared by the baseline and progressive processes. */
  private def renderMeans(id: Long, comps: Array[Component],
      w: Int, h: Int, planes: Array[Array[Int]], planeW: Array[Int],
      hmax: Int, vmax: Int): JpegPixels = {
    def sample(ci: Int, x: Int, y: Int): Int = {
      val c = comps(ci)
      planes(ci)((y * c.vi / vmax) * planeW(ci) + (x * c.hi / hmax))
    }
    var sr = 0L; var sg = 0L; var sb = 0L
    val n = w.toLong * h
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (comps.length == 1) {
          val g = sample(0, x, y); sr += g; sg += g; sb += g
        } else {
          val yv = sample(0, x, y); val cb = sample(1, x, y); val cr = sample(2, x, y)
          def clamp(d: Double): Int = {
            val i = math.floor(d + 0.5).toInt
            if (i < 0) 0 else if (i > 255) 255 else i
          }
          sr += clamp(yv + 1.402 * (cr - 128))
          sg += clamp(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
          sb += clamp(yv + 1.772 * (cb - 128))
        }
        x += 1
      }
      y += 1
    }
    JpegPixels(id, w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** The progressive (SOF2) scan loop — T.81 G.1.2 / figures G.2–G.7:
    * quantized coefficients accumulate across scans in per-component
    * stores (spectral selection picks the band, successive
    * approximation the bit plane), and only after EOI are they
    * dequantized and IDCT'd through the SAME fold as the baseline
    * process. Handles: interleaved and single-component DC scans
    * (first = shifted diffs, refinement = raw bits), non-interleaved
    * AC scans with EOB-run accumulation (first) and the figure-G.7
    * correction-bit walk (refinement, including mid-block EOB runs and
    * ZRL over zero-history positions), DHT/DQT/DRI segments BETWEEN
    * scans, and restart markers resetting predictors + EOB run. */
  private def decodeProgressiveScans(id: Long, bytes: Array[Byte],
      firstEntropy: Int, comps: Array[Component], w: Int, h: Int,
      firstScan: Array[(Int, Int, Int)],
      firstSs: Int, firstSe: Int, firstAh: Int, firstAl: Int,
      restartInterval0: Int, qt: Array[Array[Int]],
      dcT: Array[Huff], acT: Array[Huff],
      mcusX: Int, mcusY: Int, hmax: Int, vmax: Int,
      planeW: Array[Int], planeH: Array[Int],
      idctWrite: (Array[Int], Int, Int, Int) => Unit): Unit = {
    def u8(i: Int) = bytes(i) & 0xFF
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    var restartInterval = restartInterval0
    val coefStore =
      comps.indices.map(i => new Array[Int]((planeW(i) / 8) * (planeH(i) / 8) * 64)).toArray
    def blockBase(ci: Int, bx: Int, by: Int): Int =
      (by * (planeW(ci) / 8) + bx) * 64

    var curScan = firstScan
    var ss = firstSs; var se = firstSe; var ah = firstAh; var al = firstAl
    var dataPos = firstEntropy
    var sawEoi = false
    while (!sawEoi) {
      // ---- decode the current scan's entropy data ----
      val rdr = new BitReader(bytes, dataPos)
      val pred = new Array[Int](comps.length)
      var eobrun = 0
      def restart(): Unit = {
        rdr.resetBits()
        var q = rdr.pos
        while (q + 1 < bytes.length && (bytes(q) & 0xFF) == 0xFF &&
          (bytes(q + 1) & 0xFF) >= 0xD0 && (bytes(q + 1) & 0xFF) <= 0xD7) q += 2
        require(q > rdr.pos, "missing RST marker")
        rdr.pos = q
        java.util.Arrays.fill(pred, 0)
        eobrun = 0
      }
      def doBlock(ci: Int, dci: Int, aci: Int, base: Int): Unit = {
        val cf = coefStore(ci)
        if (ss == 0) { // DC band
          require(se == 0, "DC scan must have Se = 0")
          if (ah == 0) {
            val dtab = dcT(dci); require(dtab != null, "missing DHT")
            val t = rdr.huff(dtab)
            pred(ci) += extend(rdr.bits(t), t)
            cf(base) = pred(ci) << al
          } else if (rdr.bit() == 1) cf(base) |= (1 << al)
        } else if (ah == 0) { // AC first pass for this bit position
          val atab = acT(aci); require(atab != null, "missing DHT")
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            while (k <= se) {
              val rs = rdr.huff(atab); val r = rs >> 4; val s = rs & 0xF
              if (s != 0) {
                k += r
                require(k <= se, "AC index overflow")
                cf(base + ZigZag(k)) = extend(rdr.bits(s), s) << al
                k += 1
              } else if (r != 15) {
                eobrun = (1 << r) - 1
                if (r > 0) eobrun += rdr.bits(r)
                k = se + 1
              } else k += 16 // ZRL
            }
          }
        } else { // AC refinement (figure G.7)
          val atab = acT(aci); require(atab != null, "missing DHT")
          val p1 = 1 << al; val m1 = -1 << al
          var k = ss
          if (eobrun == 0) {
            var ended = false
            while (k <= se && !ended) {
              val rs = rdr.huff(atab); var r = rs >> 4; val s = rs & 0xF
              var newVal = 0
              if (s == 0) {
                if (r != 15) {
                  eobrun = 1 << r
                  if (r > 0) eobrun += rdr.bits(r)
                  ended = true
                }
                // r == 15: ZRL — skip 16 zero-history positions below
              } else {
                require(s == 1, "refinement size must be 1")
                newVal = if (rdr.bit() == 1) p1 else m1
              }
              if (!ended) {
                var placed = false
                while (k <= se && !placed) {
                  val idx = base + ZigZag(k)
                  if (cf(idx) != 0) {
                    // history-nonzero: one correction bit
                    if (rdr.bit() == 1 && (cf(idx) & p1) == 0)
                      cf(idx) += (if (cf(idx) >= 0) p1 else m1)
                  } else if (r == 0) {
                    if (s != 0) cf(idx) = newVal
                    placed = true
                  } else r -= 1
                  k += 1
                }
              }
            }
          }
          if (eobrun > 0) {
            // the EOB run covers the rest of this block: correction
            // bits still arrive for history-nonzero positions
            while (k <= se) {
              val idx = base + ZigZag(k)
              if (cf(idx) != 0 && rdr.bit() == 1 && (cf(idx) & p1) == 0)
                cf(idx) += (if (cf(idx) >= 0) p1 else m1)
              k += 1
            }
            eobrun -= 1
          }
        }
      }
      if (curScan.length > 1) { // interleaved (DC scans only, per T.81)
        require(ss == 0, "interleaved AC scan is not legal")
        var mcu = 0
        val nMcus = mcusX * mcusY
        while (mcu < nMcus) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) restart()
          val mx = mcu % mcusX; val my = mcu / mcusX
          for ((ci, dci, aci) <- curScan) {
            val c = comps(ci)
            for (by <- 0 until c.vi; bx <- 0 until c.hi)
              doBlock(ci, dci, aci, blockBase(ci, mx * c.hi + bx, my * c.vi + by))
          }
          mcu += 1
        }
      } else { // non-interleaved: the component's own block raster
        val (ci, dci, aci) = curScan(0)
        val c = comps(ci)
        val wB = (w * c.hi + 8 * hmax - 1) / (8 * hmax)
        val hB = (h * c.vi + 8 * vmax - 1) / (8 * vmax)
        var b = 0
        while (b < wB * hB) {
          if (restartInterval > 0 && b > 0 && b % restartInterval == 0) restart()
          doBlock(ci, dci, aci, blockBase(ci, b % wB, b / wB))
          b += 1
        }
      }
      // ---- advance to the next marker after the scan's entropy data ----
      var pos = rdr.pos
      while (pos + 1 < bytes.length &&
        !((bytes(pos) & 0xFF) == 0xFF && (bytes(pos + 1) & 0xFF) != 0x00)) pos += 1
      // ---- inter-scan segments until the next SOS or EOI ----
      var inScan = false
      while (!inScan && !sawEoi) {
        require(pos + 1 < bytes.length && u8(pos) == 0xFF, "marker misalign")
        var m = u8(pos + 1); var p = pos + 1
        while (m == 0xFF && p + 1 < bytes.length) { p += 1; m = u8(p) }
        pos = p - 1
        m match {
          case 0xD9 => sawEoi = true
          case 0xC4 =>
            val end = pos + 2 + u16(pos + 2)
            var o = pos + 4
            while (o < end) {
              val tcTh = u8(o)
              val counts = Array.tabulate(16)(i => u8(o + 1 + i))
              val nsym = counts.sum
              val syms = Array.tabulate(nsym)(i => u8(o + 17 + i))
              val t = new Huff(counts, syms)
              if (tcTh >> 4 == 0) dcT(tcTh & 0xF) = t else acT(tcTh & 0xF) = t
              o += 17 + nsym
            }
            pos = end
          case 0xDB =>
            val end = pos + 2 + u16(pos + 2)
            var o = pos + 4
            while (o < end) {
              val pq = u8(o) >> 4; val tq = u8(o) & 0xF
              val tbl = new Array[Int](64)
              for (i <- 0 until 64)
                tbl(ZigZag(i)) = if (pq == 0) u8(o + 1 + i) else u16(o + 1 + 2 * i)
              qt(tq) = tbl
              o += 1 + (if (pq == 0) 64 else 128)
            }
            pos = end
          case 0xDD => restartInterval = u16(pos + 4); pos += 2 + u16(pos + 2)
          case 0xDA =>
            val ns = u8(pos + 4)
            curScan = Array.tabulate(ns) { i =>
              val o = pos + 5 + 2 * i
              val cidx = comps.indexWhere(_.id == u8(o))
              require(cidx >= 0, "scan component not in frame")
              (cidx, u8(o + 1) >> 4, u8(o + 1) & 0xF)
            }
            val so = pos + 5 + 2 * ns
            ss = u8(so); se = u8(so + 1)
            ah = u8(so + 2) >> 4; al = u8(so + 2) & 0xF
            dataPos = pos + 2 + u16(pos + 2)
            inScan = true
          case _ =>
            val len = u16(pos + 2)
            require(len >= 2, "bad segment length")
            pos += 2 + len
        }
      }
    }
    // ---- all scans in: dequantize + IDCT every block ----
    for (ci <- comps.indices) {
      val c = comps(ci)
      val dq = qt(c.tq); require(dq != null, "missing DQT")
      val wB = planeW(ci) / 8; val hB = planeH(ci) / 8
      val blk = new Array[Int](64)
      for (by <- 0 until hB; bx <- 0 until wB) {
        val base = (by * wB + bx) * 64
        var n = 0
        while (n < 64) { blk(n) = coefStore(ci)(base + n) * dq(n); n += 1 }
        idctWrite(blk, ci, bx * 8, by * 8)
      }
    }
  }

  /** Distributed decode: one mapPartitions pass, malformed payloads
    * drop their ROW (never the job). */
  def decodeJpegPixels(payloadDf: DataFrame): Dataset[JpegPixels] = {
    val spark = payloadDf.sparkSession
    import spark.implicits._
    payloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (i, b) => parseJpegPixels(i, b) })
  }

  /** q258: the REAL JPEG pixel pipeline under the driver's FULL-HASH
    * gate — synthesize the coefficient-pinned baseline JPEGs, run the
    * general decoder, report per-channel means. ANY decoder fault
    * (marker walk, Huffman build, entropy decode, DC prediction,
    * dequant/zigzag, IDCT, color convert) corrupts or drops rows and
    * the gate fails. */
  def jpegDecodeAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeJpegPixels(jpegCoefPayloads(Tables.documents(spark, dir)))
      .toDF()
      .selectExpr("doc_id", "width", "height",
        "round(mean_r, 6) + 0.0 AS mean_r",
        "round(mean_g, 6) + 0.0 AS mean_g",
        "round(mean_b, 6) + 0.0 AS mean_b")
  }

  /** Progressive payloads for every document — same coefficients,
    * SOF2 scan script ([[buildCoefJpegProgressive]]). */
  def jpegProgPayloads(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          md.reset()
          (id, buildCoefJpegProgressive(id, md.digest(text.getBytes("UTF-8"))))
        }
      }.toDF("doc_id", "payload")
  }

  /** q317: the PROGRESSIVE JPEG pixel pipeline under the driver's
    * FULL-HASH gate (r15 verdict #3 — real web corpora are heavily
    * progressive; q258 only proved the baseline process). Synthesizes
    * SOF2 streams whose 8 scans exercise the whole G.1.2 surface (DC
    * first/refine, per-component AC first with cross-block EOB runs,
    * AC refinement with correction-bit buffering), runs the decoder's
    * progressive path, and — because the accumulated coefficients are
    * identical to q258's — hash-matches the SAME closed-form pixel
    * oracle. ANY fault in the successive-approximation bit plumbing
    * shifts a coefficient and the gate fails. */
  def jpegProgressiveAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeJpegPixels(jpegProgPayloads(Tables.documents(spark, dir)))
      .toDF()
      .selectExpr("doc_id", "width", "height",
        "round(mean_r, 6) + 0.0 AS mean_r",
        "round(mean_g, 6) + 0.0 AS mean_g",
        "round(mean_b, 6) + 0.0 AS mean_b")
  }

  /** DuckDB twin of [[jpegProgressiveAudit]]: q258's oracle verbatim —
    * the progressive scan script carries the same coefficients, so the
    * same closed-form pixel reconstruction is the truth for both. */
  def jpegProgressiveAuditSql: String = jpegDecodeAuditSql

  /** JPEG coding-process class by marker walk to the first SOF —
    * "baseline" (SOF0/1), "progressive" (SOF2), "other" (any other
    * SOF: lossless, arithmetic, hierarchical), "malformed" (no SOF /
    * broken chain). The triage column that makes silently-dropped
    * classes COUNTABLE (r15 verdict #3: a web corpus is heavily
    * progressive — a profile that can't see the class can't see the
    * drop rate). */
  private[graft] def jpegProcessClass(bytes: Array[Byte]): String = {
    def u8(i: Int) = if (i < bytes.length) bytes(i) & 0xFF else -1
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (bytes.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return "malformed"
    var pos = 2
    while (pos + 3 < bytes.length) {
      if (u8(pos) != 0xFF) return "malformed"
      var m = u8(pos + 1); var p = pos + 1
      while (m == 0xFF && p + 1 < bytes.length) { p += 1; m = u8(p) }
      pos = p - 1
      m match {
        case 0xC0 | 0xC1 => return "baseline"
        case 0xC2 => return "progressive"
        case mm if mm >= 0xC3 && mm <= 0xCF && mm != 0xC4 && mm != 0xC8 && mm != 0xCC =>
          return "other"
        case 0xD9 | 0xDA => return "malformed" // scan/EOI before any SOF
        case _ =>
          val len = u16(pos + 2)
          if (len < 2) return "malformed"
          pos += 2 + len
      }
    }
    "malformed"
  }

  /** A structurally valid but UNSUPPORTED-process stream: SOI, SOF3
    * (lossless sequential) header, EOI. Classifiable, not decodable —
    * the row q318 exists to count. */
  private[graft] def buildSof3Stub(id: Long): Array[Byte] = {
    val w = coefWidth(id); val h = coefHeight(id)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    u8(0xFF); u8(0xD8) // SOI
    u8(0xFF); u8(0xC3); u16(8 + 3) // SOF3, one component
    u8(8); u16(h); u16(w); u8(1); u8(1); u8(0x11); u8(0)
    u8(0xFF); u8(0xD9) // EOI
    out.toByteArray
  }

  /** q318: the coding-process triage profile over a MIXED JPEG corpus
    * (doc_id mod 5: 0–1 baseline coefficient payloads, 2–3 progressive,
    * 4 the SOF3 stub): per class, how many documents and how many the
    * decoder actually returned. The oracle recomputes both counts from
    * the corpus-construction rule — so the gate checks that the
    * CLASSIFIER routes every stream correctly AND that the decoder's
    * coverage is exactly what the profile claims (baseline +
    * progressive decode 1:1, "other" is visibly dropped, not silent). */
  def jpegClassProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          md.reset()
          val dig = md.digest(text.getBytes("UTF-8"))
          val bytes = Math.floorMod(id, 5L) match {
            case 0L | 1L => buildCoefJpeg(id, dig)
            case 2L | 3L => buildCoefJpegProgressive(id, dig)
            case _ => buildSof3Stub(id)
          }
          (jpegProcessClass(bytes),
            if (parseJpegPixels(id, bytes).isDefined) 1L else 0L)
        }
      }
      .toDF("jpeg_class", "dec")
      .groupBy(col("jpeg_class"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("dec")).cast("long").as("n_decoded"))
  }

  /** DuckDB twin of [[jpegClassProfile]]: the corpus-construction rule
    * as arithmetic — class from doc_id mod 5, decodability 1 for the
    * supported processes and 0 for "other". */
  val jpegClassProfileSql: String =
    """WITH cls AS (
      |  SELECT CASE
      |    WHEN doc_id % 5 IN (0, 1) THEN 'baseline'
      |    WHEN doc_id % 5 IN (2, 3) THEN 'progressive'
      |    ELSE 'other' END AS jpeg_class
      |  FROM documents)
      |SELECT jpeg_class, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN jpeg_class <> 'other' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_decoded
      |FROM cls GROUP BY jpeg_class""".stripMargin

  /** DuckDB twin of [[jpegDecodeAudit]]: rebuilds each block's four
    * quantized coefficients from md5(text) ([[coefVal]]'s formula),
    * dequantizes with the same Annex-K factors, reconstructs every
    * pixel with the SAME 4-term IDCT fold over the SAME cosine-table
    * double literals ([[Ct]], round-tripped through shortest-repr
    * text), clamps with the same floor(x+0.5), color-converts with the
    * same BT.601 literals and association, and averages exact integer
    * channel sums. */
  val jpegDecodeAuditSql: String = {
    def d(v: Double): String = { // round-tripping DOUBLE literal —
      // e-notation always: DuckDB types a bare decimal literal as
      // DECIMAL and the IDCT products overflow/diverge from IEEE
      val s = java.lang.Double.toString(v)
      if (s.contains("E")) s.replace("E", "e") else s + "e0"
    }
    // ct[u+1][x+1] literal list-of-lists
    val ctLit = (0 until 8).map(u =>
      (0 until 8).map(x => d(Ct(u)(x))).mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
    // natural (u, v) of the four zigzag slots, ascending natural index
    val uvs = CoefZz.map(ZigZag(_)).map(nat => (nat % 8, nat / 8))
    // per-class dequant factor at slot k
    def qf(k: Int, cls: String): Int =
      (if (cls == "l") QLuma else QChroma)(ZigZag(CoefZz(k)))
    // value expression for (c, b, k) — coefVal's formula
    def coefSql(c: String, k: Int): String =
      s"((('0x' || substr(h, 2 * ((b + 5 * $c + 3 * $k) % 16) + 1, 2))::INT % 64) - 32)"
    // channel plane value at (px, py) for component c with class cls
    def chan(c: Int, cls: String): String = {
      val terms = uvs.zipWithIndex.map { case ((u, v), k) =>
        s"(${coefSql(c.toString, k)} * ${qf(k, cls)}) * ct[${u + 1}][px + 1] * ct[${v + 1}][py + 1]"
      }.mkString(" + ")
      s"least(greatest(CAST(floor((128.0e0 + ($terms)) + 0.5e0) AS INT), 0), 255)"
    }
    s"""WITH ct_t AS (SELECT $ctLit AS ct),
       |geo AS (
       |  SELECT doc_id, md5(text) AS h,
       |    CAST(8 * (1 + doc_id % 3) AS INT) AS w,
       |    CAST(8 * (1 + doc_id % 2) AS INT) AS h_px
       |  FROM documents),
       |px AS (
       |  SELECT g.doc_id, g.w, g.h_px, g.h, ct,
       |    CAST(b AS INT) AS b, CAST(px AS INT) AS px, CAST(py AS INT) AS py
       |  FROM geo g CROSS JOIN ct_t,
       |    range(6) tb(b), range(8) tx(px), range(8) ty(py)
       |  WHERE b < (g.w // 8) * (g.h_px // 8)),
       |chanv AS (
       |  SELECT doc_id, w, h_px,
       |    ${chan(0, "l")} AS yv,
       |    ${chan(1, "c")} AS cbv,
       |    ${chan(2, "c")} AS crv
       |  FROM px),
       |rgb AS (
       |  SELECT doc_id, w, h_px,
       |    least(greatest(CAST(floor((yv + 1.402e0 * (crv - 128)) + 0.5e0) AS INT), 0), 255) AS r,
       |    least(greatest(CAST(floor((yv - 0.344136e0 * (cbv - 128) - 0.714136e0 * (crv - 128)) + 0.5e0) AS INT), 0), 255) AS g,
       |    least(greatest(CAST(floor((yv + 1.772e0 * (cbv - 128)) + 0.5e0) AS INT), 0), 255) AS b
       |  FROM chanv)
       |SELECT doc_id, w AS width, h_px AS height,
       |  round(CAST(sum(r) AS DOUBLE) / CAST(w * h_px AS DOUBLE), 6) + 0.0 AS mean_r,
       |  round(CAST(sum(g) AS DOUBLE) / CAST(w * h_px AS DOUBLE), 6) + 0.0 AS mean_g,
       |  round(CAST(sum(b) AS DOUBLE) / CAST(w * h_px AS DOUBLE), 6) + 0.0 AS mean_b
       |FROM rgb GROUP BY doc_id, w, h_px""".stripMargin
  }
}
