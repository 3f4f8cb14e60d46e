package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import sources.PagedApi

/** Paginated-API source against file:// fixtures (zero-egress twin of
  * a REST endpoint): distributed page fetch, envelope/array/JSONL
  * payloads, count-probe sizing, record quarantine, bounded retry.
  */
class PagedApiSpec extends AnyFunSuite {
  lazy val spark = Engine.session()

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private def record(i: Int): String =
    s"""{"id":$i,"name":"rec$i","score":${i * 0.5}}"""

  private def writePages(shape: Int => Seq[String] => String): String = {
    val dir = Files.createTempDirectory("graft-api").toString
    (0 until 3).foreach { p =>
      val recs = (p * 10 until (p + 1) * 10).map(record)
      Files.writeString(Paths.get(s"$dir/page$p.json"), shape(p)(recs))
    }
    dir
  }

  test("array-of-objects pages: typed rows with page provenance") {
    val dir = writePages(_ => recs => recs.mkString("[", ",", "]"))
    val df = PagedApi.read(spark, s"file://$dir/page{page}.json", 3L, schema,
      pageSize = 10).cache()
    assert(df.count() == 30)
    assert(df.filter(col(PagedApi.RescueCol).isNotNull).count() == 0)
    val r7 = df.filter(col("id") === 7).collect().head
    assert(r7.getAs[String]("name") == "rec7")
    assert(r7.getAs[Double]("score") == 3.5)
    assert(r7.getAs[Long](PagedApi.PageCol) == 0L)
    assert(df.filter(col(PagedApi.PageCol) === 2L).count() == 10)
  }

  test("count-envelope: driver probe sizes the fetch, readAll gets every record") {
    val dir = writePages(_ => recs =>
      s"""{"count":25,"results":[${recs.mkString(",")}]}""")
    val n = PagedApi.discoverPages(s"file://$dir/page{page}.json",
      pageSize = 10, countField = "count")
    assert(n == 3)
    val df = PagedApi.readAll(spark, s"file://$dir/page{page}.json", schema,
      pageSize = 10, countField = "count", dataField = Some("results"))
    assert(df.count() == 30)
    assert(df.agg(sum("id")).collect().head.getLong(0) == (0 until 30).sum)
  }

  test("JSONL pages with a malformed record: quarantined, not fatal") {
    val dir = Files.createTempDirectory("graft-api-bad").toString
    Files.writeString(Paths.get(s"$dir/page0.json"),
      record(0) + "\n" + "{this is not json}\n" + record(1) + "\n")
    val df = PagedApi.read(spark, s"file://$dir/page{page}.json", 1L, schema)
      .cache()
    assert(df.count() == 3)
    val bad = df.filter(col(PagedApi.RescueCol).isNotNull).collect()
    assert(bad.length == 1)
    assert(bad.head.getAs[String](PagedApi.RescueCol).contains("not json"))
    assert(bad.head.isNullAt(bad.head.fieldIndex("id")))
    assert(df.filter(col(PagedApi.RescueCol).isNull).count() == 2)
  }

  test("offset/limit placeholder expansion") {
    assert(PagedApi.pageUrl("http://x/api?offset={offset}&limit={limit}", 3L, 50)
      == "http://x/api?offset=150&limit=50")
    assert(PagedApi.pageUrl("file:///d/page{page}.json", 7L, 10)
      == "file:///d/page7.json")
  }

  test("fetch of an unreachable page fails with a named error after retries") {
    val e = intercept[Exception] {
      PagedApi.read(spark, "file:///nonexistent/page{page}.json", 1L, schema,
        retries = 1, timeoutMs = 500).count()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("paged-api fetch failed")))
  }

  test("empty feed: zero pages is a valid, empty frame") {
    val df = PagedApi.read(spark, "file:///unused/page{page}.json", 0L, schema)
    assert(df.count() == 0)
    assert(df.columns.toSeq ==
      Seq("id", "name", "score", PagedApi.RescueCol, PagedApi.PageCol))
  }
}
