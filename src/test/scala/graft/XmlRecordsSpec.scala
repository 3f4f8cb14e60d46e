package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import sources.XmlRecords

class XmlRecordsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private val schema = StructType(Seq(
    StructField("title", StringType), StructField("body", StringType)))

  private def writeFile(dir: String, name: String, content: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), content.getBytes("UTF-8"))
  }

  test("records extract with attributes, CDATA, entities, missing fields") {
    val dir = Files.createTempDirectory("xmlrec").toString
    writeFile(dir, "a.xml",
      """<dump version="1">
        |<page id="1"><title>First &amp; Second</title>
        |  <body><![CDATA[keep <raw> & entities]]></body></page>
        |<page><title>NoBody</title></page>
        |<page><other>nothing requested</other></page>
        |</dump>""".stripMargin)
    val out = XmlRecords.readFields(spark, dir, "page", schema)
      .select("record_idx", "title", "body", XmlRecords.RescueCol)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(out == Set(
      (1L, Some("First & Second"), Some("keep <raw> & entities"), None),
      (2L, Some("NoBody"), None, None),
      (3L, None, None, Some("<other>nothing requested</other>"))))
  }

  test("split mode parses one big dump identically to wholetext mode") {
    val dir1 = Files.createTempDirectory("xmlsplit").toString
    val pages = (1 to 50).map(i =>
      s"<page>\n<title>T$i</title><body>B&amp;$i</body>\n</page>").mkString("\n")
    writeFile(dir1, "dump.xml", s"<dump>\n$pages\n</dump>")
    val whole = XmlRecords.readFields(spark, dir1, "page", schema)
      .select("title", "body").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val split = XmlRecords.mapFields(
      XmlRecords.readRecordsSplit(spark, dir1, "page"), schema)
      .select("title", "body").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(whole == split)
    assert(whole == (1 to 50).map(i => (s"T$i", s"B&$i")).toSet)
    assert(split.size == 50) // trailer chunk after the last </page> dropped
  }

  test("malformed rescue keeps the raw span; no row is silently dropped") {
    val dir = Files.createTempDirectory("xmlbad").toString
    writeFile(dir, "b.xml",
      "<r><x>1</x></r><r><title>ok</title></r><r><y>2</y></r>")
    val out = XmlRecords.readFields(spark, dir, "r", schema)
    assert(out.count() == 3)
    assert(out.filter(col(XmlRecords.RescueCol).isNotNull).count() == 2)
    assert(out.filter(col("title") === "ok").count() == 1)
  }
}
