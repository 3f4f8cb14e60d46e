package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ESRI shapefile source — the binary format the reference's GIS ETL
  * actually ingests (`district_gis_etl.py:42` reads
  * `SCHOOLDISTRICTS_POLY.shp` via geopandas); [[GeoJson]] covers the
  * open-interchange sibling, this reader closes the "my input files ARE
  * .shp" gap. Format per the public ESRI Shapefile Technical
  * Description (July 1998): `.shp` = 100-byte header + records of
  * (big-endian record header, little-endian geometry); `.dbf` = dBASE
  * III attribute table paired to `.shp` by physical record order.
  *
  * Geometry lands in the SAME shape [[GeoJson.parseFeatures]] emits —
  * `geometry_type`, `px`/`py` for points, `rings` as
  * `array<struct<xs array<double>, ys array<double>>>` — so
  * [[graft.operators.Geo.ringsBbox]] / `pointInRings` / `gridJoin`
  * consume shapefile features unchanged. Shapefile polygon "parts" map
  * 1:1 onto rings (outer rings + holes in one flat list), exactly how
  * GeoJson MultiPolygons arrive after `flatten`.
  *
  * Supported shape types: 0 (Null), 1 (Point), 3 (PolyLine),
  * 5 (Polygon), 8 (MultiPoint, as one ring of points). Z/M variants
  * and anything else quarantine per-record into `_malformed` — the
  * [[JsonLines.readWithRescue]] contract; a structurally corrupt file
  * yields one malformed row and parsing stops at the corruption point
  * (a bogus record length would otherwise mis-frame everything after
  * it).
  *
  * Distribution model: `binaryFile` rows, ONE record per FILE, parsed
  * executor-side (a .shp is not splittable — record framing is
  * sequential). Parallelism is per-file, the [[GeoJson.readCollection]]
  * scale class: right for reference-data-sized shape sets (thousands of
  * districts); corpus-scale geometry should be converted once to
  * GeoJSONL and read with [[GeoJson.readLines]].
  */
object Shapefile {

  val RescueCol = "_malformed"

  case class Ring(xs: Seq[Double], ys: Seq[Double])
  case class ShpFeature(path: String, record_no: Int, geometry_type: String,
      px: java.lang.Double, py: java.lang.Double, rings: Seq[Ring],
      _malformed: String)
  case class DbfRecord(path: String, record_no: Int, deleted: Boolean,
      attrs: Map[String, String], _malformed: String)

  private def typeName(t: Int): Option[String] = t match {
    case 0 => Some("Null")
    case 1 => Some("Point")
    case 3 => Some("PolyLine")
    case 5 => Some("Polygon")
    case 8 => Some("MultiPoint")
    case _ => None
  }

  /** Parse one .shp file's bytes into features (pure; executor-side). */
  private[sources] def parseShp(path: String, bytes: Array[Byte]): Seq[ShpFeature] = {
    def bad(no: Int, why: String) =
      ShpFeature(path, no, null, null, null, null, why)
    if (bytes.length < 100)
      return Seq(bad(0, s"file too short for header: ${bytes.length}B"))
    val bb = ByteBuffer.wrap(bytes)
    val fileCode = bb.order(ByteOrder.BIG_ENDIAN).getInt(0)
    if (fileCode != 9994)
      return Seq(bad(0, s"bad file code $fileCode (want 9994)"))
    // header file length is in 16-bit words, includes the header
    val declaredLen = bb.order(ByteOrder.BIG_ENDIAN).getInt(24).toLong * 2
    val end = math.min(bytes.length.toLong, declaredLen).toInt
    val out = Seq.newBuilder[ShpFeature]
    var off = 100
    var corrupt = false
    while (!corrupt && off + 8 <= end) {
      val recNo = bb.order(ByteOrder.BIG_ENDIAN).getInt(off)
      val contentBytes = bb.order(ByteOrder.BIG_ENDIAN).getInt(off + 4) * 2
      val start = off + 8
      if (contentBytes < 4 || start + contentBytes > end) {
        out += bad(recNo, s"record $recNo: content length $contentBytes " +
          s"overruns file (at offset $off)")
        corrupt = true // framing is lost; nothing after is trustworthy
      } else {
        val le = bb.order(ByteOrder.LITTLE_ENDIAN)
        val shapeType = le.getInt(start)
        typeName(shapeType) match {
          case None =>
            out += bad(recNo, s"record $recNo: unsupported shape type $shapeType")
          case Some("Null") =>
            out += ShpFeature(path, recNo, "Null", null, null, null, null)
          case Some("Point") =>
            if (contentBytes < 20)
              out += bad(recNo, s"record $recNo: short Point record")
            else out += ShpFeature(path, recNo, "Point",
              le.getDouble(start + 4), le.getDouble(start + 12), null, null)
          case Some(tn @ ("PolyLine" | "Polygon")) =>
            // box(32) + numParts(4) + numPoints(4) then parts, points
            if (contentBytes < 44)
              out += bad(recNo, s"record $recNo: short $tn record")
            else {
              val nParts = le.getInt(start + 36)
              val nPoints = le.getInt(start + 40)
              val need = 44 + 4 * nParts + 16 * nPoints
              if (nParts <= 0 || nPoints < 0 || contentBytes < need)
                out += bad(recNo, s"record $recNo: $tn parts/points " +
                  s"($nParts/$nPoints) overrun content length $contentBytes")
              else {
                val partIdx = (0 until nParts).map(i => le.getInt(start + 44 + 4 * i))
                val ptBase = start + 44 + 4 * nParts
                val bounds = partIdx :+ nPoints
                if (partIdx.exists(i => i < 0 || i > nPoints) ||
                    bounds.sliding(2).exists(s => s(0) > s(1)))
                  out += bad(recNo, s"record $recNo: non-monotone part offsets")
                else {
                  val rings = bounds.sliding(2).collect { case Seq(a, b) if a < b =>
                    Ring(
                      (a until b).map(i => le.getDouble(ptBase + 16 * i)),
                      (a until b).map(i => le.getDouble(ptBase + 16 * i + 8)))
                  }.toSeq
                  out += ShpFeature(path, recNo, tn, null, null, rings, null)
                }
              }
            }
          case Some("MultiPoint") =>
            if (contentBytes < 40)
              out += bad(recNo, s"record $recNo: short MultiPoint record")
            else {
              val nPoints = le.getInt(start + 36)
              if (nPoints < 0 || contentBytes < 40 + 16 * nPoints)
                out += bad(recNo, s"record $recNo: MultiPoint overrun")
              else out += ShpFeature(path, recNo, "MultiPoint", null, null,
                Seq(Ring(
                  (0 until nPoints).map(i => le.getDouble(start + 40 + 16 * i)),
                  (0 until nPoints).map(i => le.getDouble(start + 40 + 16 * i + 8)))),
                null)
            }
          case Some(other) => // unreachable; keep the match total
            out += bad(recNo, s"record $recNo: unhandled $other")
        }
        off = start + contentBytes
      }
    }
    val res = out.result()
    if (res.isEmpty) Seq(bad(0, "no records")) else res
  }

  /** Parse one .dbf file's bytes (dBASE III): every physical record,
    * with its deletion flag, attributes as trimmed strings keyed by
    * field name. Numeric/date typing is left to the caller's cast —
    * DBF stores everything as fixed-width text anyway. */
  private[sources] def parseDbf(path: String, bytes: Array[Byte]): Seq[DbfRecord] = {
    def bad(why: String) = Seq(DbfRecord(path, 0, deleted = false, null, why))
    if (bytes.length < 33) return bad(s"file too short for header: ${bytes.length}B")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = bb.getInt(4)
    val headerSize = bb.getShort(8) & 0xffff
    val recSize = bb.getShort(10) & 0xffff
    if (headerSize < 33 || headerSize > bytes.length)
      return bad(s"bad header size $headerSize")
    // field descriptors: 32B each from offset 32 until the 0x0D terminator
    val fields = Seq.newBuilder[(String, Int)] // (name, length)
    var fo = 32
    while (fo + 32 <= headerSize && bytes(fo) != 0x0d) {
      val name = new String(bytes, fo, 11, StandardCharsets.ISO_8859_1)
        .takeWhile(_ != ' ').trim
      val len = bytes(fo + 16) & 0xff
      fields += name -> len
      fo += 32
    }
    val fs = fields.result()
    if (fs.isEmpty) return bad("no field descriptors")
    if (1 + fs.map(_._2).sum != recSize)
      return bad(s"field widths ${fs.map(_._2).sum}+1 != record size $recSize")
    // clamp the header's record count to what the bytes can actually
    // hold: a corrupt count (up to Int.MaxValue — the field is
    // attacker/corruption-controlled) would otherwise materialize
    // billions of "truncated file" rows in one task; the contract is
    // ONE quarantine row at the corruption point, like parseShp
    val fitRec = ((bytes.length.toLong - headerSize) / recSize)
      .max(0L).min(Int.MaxValue.toLong).toInt
    val present = math.min(nRec, fitRec)
    val parsed = (0 until present).map { i =>
      val ro = headerSize + i.toLong * recSize
      val deleted = bytes(ro.toInt) == '*'
      var co = ro.toInt + 1
      val attrs = fs.map { case (n, l) =>
        val v = new String(bytes, co, l, StandardCharsets.ISO_8859_1).trim
        co += l
        n -> v
      }.toMap
      DbfRecord(path, i + 1, deleted, attrs, null)
    }
    if (nRec > present)
      parsed :+ DbfRecord(path, present + 1, deleted = false, null,
        s"truncated file: header declares $nRec records, bytes hold $present")
    else parsed
  }

  /** Read .shp geometry: (path, record_no, geometry_type, px, py,
    * rings, _malformed) — one row per shapefile record. */
  def readShp(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.shp").load(path)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (p, b) => parseShp(p, b) }
      .toDF()
  }

  /** Read .dbf attributes: (path, record_no, deleted, attrs, _malformed). */
  def readDbf(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.dbf").load(path)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (p, b) => parseDbf(p, b) }
      .toDF()
  }

  /** Joined layer read: geometry + the named attribute fields as string
    * columns, paired by (file stem, record_no) — the shapefile
    * contract: .shp record i ↔ .dbf physical record i. Deleted dbf
    * records pair up but keep their flag so callers can filter.
    * `dir` should contain the sibling `.shp`/`.dbf` files. */
  def read(spark: SparkSession, dir: String, attrFields: Seq[String]): DataFrame = {
    val stem = (c: org.apache.spark.sql.Column) =>
      regexp_replace(regexp_extract(c, "([^/]+)$", 1), "\\.(shp|dbf)$", "")
    val shp = readShp(spark, dir).withColumn("layer", stem(col("path"))).drop("path")
    val dbf = readDbf(spark, dir).withColumn("layer", stem(col("path"))).drop("path")
      .select(Seq(col("layer"), col("record_no"), col("deleted")) ++
        attrFields.map(f => col("attrs").getItem(f).as(f)): _*)
    shp.join(dbf, Seq("layer", "record_no"), "left")
  }
}
