package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import sources.Shapefile

/** Shapefile source spec: bytes are SYNTHESIZED here per the public
  * ESRI spec (no fixture files), written to a temp dir, and read back
  * through the distributed source. */
class ShapefileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  // ---- byte builders (test-side writer; the source only reads) ----

  private def le(n: Int)(f: ByteBuffer => Unit): Array[Byte] = {
    val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN); f(b); b.array()
  }

  private def shpRecord(recNo: Int, content: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + content.length).order(ByteOrder.BIG_ENDIAN)
    b.putInt(recNo).putInt(content.length / 2).put(content)
    b.array()
  }

  private def shpFile(records: Seq[Array[Byte]]): Array[Byte] = {
    val total = 100 + records.map(_.length).sum
    val b = ByteBuffer.allocate(total)
    b.order(ByteOrder.BIG_ENDIAN).putInt(0, 9994)
    b.order(ByteOrder.BIG_ENDIAN).putInt(24, total / 2)
    b.order(ByteOrder.LITTLE_ENDIAN).putInt(28, 1000)
    b.order(ByteOrder.LITTLE_ENDIAN).putInt(32, 5) // layer type (informational)
    b.position(100)
    records.foreach(b.put)
    b.array()
  }

  private def pointRec(x: Double, y: Double): Array[Byte] =
    le(20) { b => b.putInt(1).putDouble(x).putDouble(y) }

  private def polyRec(shapeType: Int, parts: Seq[Seq[(Double, Double)]]): Array[Byte] = {
    val nPts = parts.map(_.length).sum
    le(44 + 4 * parts.length + 16 * nPts) { b =>
      b.putInt(shapeType)
      (0 until 4).foreach(_ => b.putDouble(0.0)) // box: reader ignores
      b.putInt(parts.length).putInt(nPts)
      parts.scanLeft(0)(_ + _.length).init.foreach(b.putInt)
      parts.flatten.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
    }
  }

  private def dbfFile(fields: Seq[(String, Char, Int)],
      rows: Seq[(Boolean, Seq[String])]): Array[Byte] = {
    val recSize = 1 + fields.map(_._3).sum
    val headerSize = 32 + 32 * fields.length + 1
    val b = ByteBuffer.allocate(headerSize + rows.length * recSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(0, 0x03.toByte)
    b.putInt(4, rows.length)
    b.putShort(8, headerSize.toShort)
    b.putShort(10, recSize.toShort)
    fields.zipWithIndex.foreach { case ((name, typ, len), i) =>
      val fo = 32 + 32 * i
      val nb = name.getBytes(StandardCharsets.ISO_8859_1)
      b.put(fo, nb, 0, math.min(11, nb.length))
      b.put(fo + 11, typ.toByte)
      b.put(fo + 16, len.toByte)
    }
    b.put(32 + 32 * fields.length, 0x0d.toByte)
    rows.zipWithIndex.foreach { case ((deleted, vals), i) =>
      var off = headerSize + i * recSize
      b.put(off, (if (deleted) '*' else ' ').toByte); off += 1
      fields.zip(vals).foreach { case ((_, _, len), v) =>
        val padded = v.padTo(len, ' ').take(len)
        b.put(off, padded.getBytes(StandardCharsets.ISO_8859_1)); off += len
      }
    }
    b.array()
  }

  private val outer = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0))
  private val hole = Seq((2.0, 2.0), (2.0, 4.0), (4.0, 4.0), (4.0, 2.0), (2.0, 2.0))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-shp").toString
    val records = Seq(
      shpRecord(1, pointRec(3.5, -2.25)),
      shpRecord(2, polyRec(5, Seq(outer, hole))),
      shpRecord(3, le(20) { b => b.putInt(11).putDouble(1).putDouble(2) }), // PointZ
      shpRecord(4, le(4) { b => b.putInt(0) }), // Null shape
      shpRecord(5, polyRec(3, Seq(Seq((0.0, 0.0), (1.0, 1.0)),
        Seq((5.0, 5.0), (6.0, 6.0), (7.0, 8.0))))))
    Files.write(Paths.get(d, "districts.shp"), shpFile(records))
    Files.write(Paths.get(d, "districts.dbf"), dbfFile(
      Seq(("NAME", 'C', 10), ("POP", 'N', 6)),
      Seq((false, Seq("north", "120")), (false, Seq("south", "3400")),
        (true, Seq("gone", "1")), (false, Seq("nowhere", "0")),
        (false, Seq("line", "77")))))
    d
  }

  test("readShp: point, polygon-with-hole, polyline parse; Z-type quarantined") {
    val rows = Shapefile.readShp(spark, dir).collect()
      .map(r => r.getInt(1) -> r).toMap
    assert(rows.size == 5)
    val pt = rows(1)
    assert(pt.getString(2) == "Point" && pt.getDouble(3) == 3.5 && pt.getDouble(4) == -2.25)
    val poly = rows(2)
    assert(poly.getString(2) == "Polygon")
    val rings = poly.getSeq[org.apache.spark.sql.Row](5)
    assert(rings.length == 2)
    assert(rings(0).getSeq[Double](0) == outer.map(_._1) &&
      rings(0).getSeq[Double](1) == outer.map(_._2))
    assert(rings(1).getSeq[Double](0) == hole.map(_._1))
    assert(rows(3).getString(2) == null &&
      rows(3).getString(6).contains("unsupported shape type 11"))
    assert(rows(4).getString(2) == "Null" && rows(4).isNullAt(5))
    val line = rows(5)
    assert(line.getString(2) == "PolyLine" &&
      line.getSeq[org.apache.spark.sql.Row](5).map(_.getSeq[Double](0).length) == Seq(2, 3))
  }

  test("readDbf: names, trimmed values, deletion flags, physical order") {
    val rows = Shapefile.readDbf(spark, dir).collect()
      .map(r => r.getInt(1) -> r).toMap
    assert(rows.size == 5)
    val attrs = (i: Int) => rows(i).getMap[String, String](3)
    assert(attrs(1) == Map("NAME" -> "north", "POP" -> "120"))
    assert(attrs(2)("POP") == "3400")
    assert(rows(3).getBoolean(2) && attrs(3)("NAME") == "gone")
    assert(!rows(1).getBoolean(2))
  }

  test("joined read pairs geometry with attributes and feeds Geo operators") {
    import operators.Geo
    val df = Shapefile.read(spark, dir, Seq("NAME", "POP")).cache()
    assert(df.count() == 5)
    // record 2 = the south polygon, POP castable
    val south = df.filter(col("record_no") === 2)
    assert(south.select("NAME").head.getString(0) == "south")
    assert(south.select(col("POP").cast("long")).head.getLong(0) == 3400L)
    // rings schema is Geo-compatible: bbox + even-odd point-in-polygon
    val g = south
      .withColumn("bb", Geo.ringsBbox(col("rings")))
      .select(
        col("bb"),
        Geo.pointInRings(col("rings"), lit(5.0), lit(5.0)).as("in_body"),
        Geo.pointInRings(col("rings"), lit(3.0), lit(3.0)).as("in_hole"),
        Geo.pointInRings(col("rings"), lit(11.0), lit(5.0)).as("outside"))
      .head
    assert(g.getStruct(0).getDouble(0) == 0.0 && g.getStruct(0).getDouble(2) == 10.0)
    assert(g.getBoolean(1) && !g.getBoolean(2) && !g.getBoolean(3))
  }

  test("corrupt record length quarantines and stops mis-framed parsing") {
    val d = Files.createTempDirectory("graft-shp-bad").toString
    val good = shpRecord(1, pointRec(1.0, 2.0))
    // record 2 claims 5000 content words but the file ends
    val badHeader = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
      .putInt(2).putInt(5000).array()
    val fileBytes = shpFile(Seq(good, badHeader ++ le(4)(_.putInt(1))))
    Files.write(Paths.get(d, "bad.shp"), fileBytes)
    val rows = Shapefile.readShp(spark, d).orderBy("record_no").collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(1) == 1 && rows(0).getString(2) == "Point")
    assert(rows(1).getString(6) != null &&
      rows(1).getString(6).contains("overruns file"))
    // not-a-shapefile: single quarantine row
    Files.write(Paths.get(d, "junk.shp"), ("not a shapefile at all " * 8).getBytes)
    val junk = Shapefile.readShp(spark, d)
      .filter(col("path").contains("junk")).collect()
    assert(junk.length == 1 && junk(0).getString(6).contains("bad file code"))
  }

  test("dbf: overstated header record count yields ONE quarantine row, not billions") {
    val d = Files.createTempDirectory("graft-dbf-bad").toString
    val bytes = dbfFile(Seq(("NAME", 'C', 10)), Seq((false, Seq("only"))))
    // corrupt the count field to Int.MaxValue: the reader must parse
    // the one record the bytes hold and quarantine the rest as a
    // single truncation row (materializing 2^31 malformed rows would
    // OOM the task)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).putInt(4, Int.MaxValue)
    Files.write(Paths.get(d, "bad.dbf"), bytes)
    val rows = Shapefile.readDbf(spark, d).collect()
    assert(rows.length == 2)
    assert(rows.count(_.getString(4) == null) == 1)
    val q = rows.find(_.getString(4) != null).get
    assert(q.getString(4).contains("truncated file"))
  }
}
