package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import sinks.JdbcCopySink
import sinks.Sinks.JdbcReplace
import sources.Jdbc

/** COPY-protocol sink: CSV/SQL framing as pure functions, and the
  * non-Postgres fallback (batched INSERT) against embedded Derby —
  * the sandbox has no Postgres; the CopyManager path is a documented
  * reflective seam exercised only by framing tests. */
class JdbcCopySinkSpec extends AnyFunSuite {
  System.setProperty("derby.stream.error.file", "/tmp/derby.log")
  lazy val spark: SparkSession = Engine.session()
  val dbDir = s"/tmp/graft-derby-copy-${System.nanoTime()}"
  val url = s"jdbc:derby:$dbDir;create=true"

  test("csv framing: NULL is unquoted empty; empty string is quoted") {
    assert(JdbcCopySink.csvField(null) == "")
    assert(JdbcCopySink.csvField("") == "\"\"")
  }

  test("csv framing: quoting is minimal and quotes double") {
    assert(JdbcCopySink.csvField("plain") == "plain")
    assert(JdbcCopySink.csvField("a,b") == "\"a,b\"")
    assert(JdbcCopySink.csvField("say \"hi\"") == "\"say \"\"hi\"\"\"")
    assert(JdbcCopySink.csvField("line1\nline2") == "\"line1\nline2\"")
    assert(JdbcCopySink.csvField("cr\rhere") == "\"cr\rhere\"")
  }

  test("csv framing: scalars, booleans, bytea hex") {
    assert(JdbcCopySink.csvField(42L) == "42")
    assert(JdbcCopySink.csvField(0.25) == "0.25")
    assert(JdbcCopySink.csvField(true) == "true")
    assert(JdbcCopySink.csvField(false) == "false")
    assert(JdbcCopySink.csvField(Array[Byte](0x0a, 0x00, -1)) == "\\x0a00ff")
    assert(JdbcCopySink.csvField(Timestamp.valueOf("2024-03-01 10:30:00"))
      == "2024-03-01 10:30:00.0")
  }

  test("csv framing: record layout") {
    assert(JdbcCopySink.csvLine(Seq("a", null, "", 7L)) == "a,,\"\",7")
  }

  test("copy statement: quoted case-exact identifiers") {
    assert(JdbcCopySink.copySql("warehouse.t", Seq("county", "prop_yes")) ==
      """COPY warehouse.t ("county", "prop_yes") FROM STDIN WITH (FORMAT csv)""")
  }

  test("unsafe identifiers refused before any connection opens") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "name")
    intercept[IllegalArgumentException](
      JdbcCopySink.write(df, url, "t; DROP TABLE x"))
    intercept[IllegalArgumentException](
      JdbcCopySink.write(df.withColumnRenamed("name", "na me"), url, "t"))
  }

  test("fallback path on Derby: append with nulls, specials, timestamps") {
    import spark.implicits._
    val rows = Seq(
      (1L, "SUFFOLK", Some(0.51), Some(Timestamp.valueOf("2024-01-01 00:00:00"))),
      (2L, "say \"hi\", ok", Some(-3.25), None),
      (3L, null.asInstanceOf[String], None,
        Some(Timestamp.valueOf("2024-06-15 12:30:45"))))
    val df = rows.toDF("id", "name", "score", "loaded_at")
    // create the table shape (0 rows), then COPY-sink appends into it
    JdbcReplace.write(df.limit(0).coalesce(1), url, "copy_target",
      Map("createTableColumnTypes" -> "name VARCHAR(64)"))
    JdbcCopySink.write(df.repartition(2), url, "copy_target", batchSize = 2)
    val back = Jdbc.read(spark, url, "copy_target")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getTimestamp(3))))
      .sortBy(_._1).toSeq
    assert(back == rows.map(r => (r._1, r._2, r._3, r._4)))
    // append semantics: a second write doubles the rows
    JdbcCopySink.write(df.coalesce(1), url, "copy_target")
    assert(Jdbc.read(spark, url, "copy_target").count() == 6)
  }
}
