package graft.sources

import java.io.InputStream
import java.net.{URI, URLConnection}
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Distributed paginated-API source — the engine twin of the
  * reference's census pull (`query_census_data.Rmd:9-50`, tidycensus
  * `get_acs`), which fetches a dimension table page by page from a
  * REST endpoint instead of a file.
  *
  * Execution shape for a 1000-executor cluster:
  *   - the DRIVER does at most one tiny probe request (page 0) to
  *     learn the record count — the same class of metadata read as a
  *     parquet footer;
  *   - page indices are then distributed via `spark.range(nPages)`
  *     and each TASK fetches its own pages (connect/read timeouts,
  *     bounded exponential-backoff retries). A page that still fails
  *     after retries fails the task, so Spark's own task retry /
  *     speculation machinery governs availability — no silent holes;
  *   - page payloads never aggregate on the driver: each task parses
  *     its pages to records and hands typed rows straight to the
  *     downstream plan. Memory per task is one page, not one table;
  *   - record-level parse failures quarantine into a `_malformed`
  *     rescue column ([[JsonLines]] philosophy): typed nulls + raw
  *     record text, never a killed job.
  *
  * Supported payload shapes (auto-detected per page):
  *   - a JSON array of objects (`[{...},{...}]`),
  *   - an envelope object with the records under `dataField`
  *     (`{"count":N,"results":[...]}`),
  *   - JSON-lines (one object per line).
  *
  * Zero-egress testing: `java.net.URL` resolves `file://` URLs with
  * the same code path, so specs exercise real fetch/parse/quarantine
  * against local fixtures.
  */
object PagedApi {

  val RescueCol = "_malformed"
  val PageCol = "_page"

  /** Expand `{page}` / `{offset}` / `{limit}` placeholders. */
  def pageUrl(template: String, page: Long, pageSize: Int): String =
    template
      .replace("{page}", page.toString)
      .replace("{offset}", (page * pageSize).toString)
      .replace("{limit}", pageSize.toString)

  /** Fetch one URL body with timeouts and bounded exponential-backoff
    * retries. Serializable-safe: called from executor tasks.
    */
  def fetch(url: String, timeoutMs: Int = 10000, retries: Int = 3): String = {
    var attempt = 0
    var last: Throwable = null
    while (attempt <= retries) {
      try {
        val conn: URLConnection = new URI(url).toURL.openConnection()
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        val in: InputStream = conn.getInputStream
        try return new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      } catch {
        case e: Exception =>
          last = e
          attempt += 1
          if (attempt <= retries)
            Thread.sleep(math.min(100L << attempt, 2000L))
      }
    }
    throw new RuntimeException(
      s"paged-api fetch failed after ${retries + 1} attempts: $url", last)
  }

  /** Split one page body into raw JSON record strings. Pure; runs on
    * executors. Jackson (bundled with Spark) does the envelope/array
    * walk; individual records are re-serialized verbatim so the typed
    * parse + quarantine happens uniformly downstream.
    */
  def splitRecords(body: String, dataField: Option[String]): Seq[String] = {
    val trimmed = body.trim
    if (trimmed.isEmpty) return Seq.empty
    val mapper = new ObjectMapper()
    def elems(node: JsonNode): Seq[String] = {
      val buf = new ArrayBuffer[String](node.size())
      val it = node.elements()
      while (it.hasNext) buf += mapper.writeValueAsString(it.next())
      buf.toSeq
    }
    if (trimmed.startsWith("[")) elems(mapper.readTree(trimmed))
    else if (trimmed.startsWith("{") && dataField.isDefined) {
      val root = mapper.readTree(trimmed)
      val data = root.get(dataField.get)
      if (data == null || !data.isArray)
        throw new IllegalArgumentException(
          s"paged-api envelope has no array field '${dataField.get}'")
      elems(data)
    } else trimmed.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Driver-side probe: fetch page 0, read the total record count from
    * `countField` in the envelope, return the page count. One request,
    * footer-sized — the only non-distributed step.
    */
  def discoverPages(template: String, pageSize: Int, countField: String,
                    timeoutMs: Int = 10000, retries: Int = 3): Long = {
    val body = fetch(pageUrl(template, 0L, pageSize), timeoutMs, retries)
    val node = new ObjectMapper().readTree(body).get(countField)
    if (node == null || !node.canConvertToLong)
      throw new IllegalArgumentException(
        s"paged-api probe: no numeric '$countField' in page-0 envelope")
    val total = node.asLong()
    (total + pageSize - 1) / pageSize
  }

  /** Distributed paginated read: `nPages` fetches spread over the
    * cluster, parsed against an EXPLICIT schema (inference over an API
    * would serialize every page through the driver — never). Output
    * columns: the schema's fields + `_page` (provenance: which page a
    * record came from) + `_malformed` (raw text of quarantined
    * records, null for good rows).
    */
  def read(spark: SparkSession, template: String, nPages: Long,
           schema: StructType, pageSize: Int = 1000,
           dataField: Option[String] = None, timeoutMs: Int = 10000,
           retries: Int = 3, parallelism: Option[Int] = None): DataFrame = {
    require(nPages >= 0, s"nPages must be >= 0, got $nPages")
    import spark.implicits._
    val slices = math.max(1, math.min(
      nPages, parallelism.getOrElse(spark.sparkContext.defaultParallelism).toLong)).toInt
    val raw = spark.range(0L, nPages, 1L, slices)
      .as[Long]
      .mapPartitions { pages =>
        pages.flatMap { p =>
          val body = fetch(pageUrl(template, p, pageSize), timeoutMs, retries)
          splitRecords(body, dataField).map(r => (p, r))
        }
      }
      .toDF(PageCol, "record")
    // typed parse with rescue: PERMISSIVE from_json fills the corrupt
    // column for bad records; a fully unparseable record yields a null
    // struct, so the raw text is rescued explicitly in that case too
    val parseSchema = schema.add(RescueCol, StringType)
    val parsed = raw.withColumn("_r",
      from_json(col("record"), parseSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> RescueCol)))
    val dataCols = schema.fields.map(f => col(s"_r.${f.name}").as(f.name))
    parsed.select(
      (dataCols :+
        when(col("_r").isNull, col("record"))
          .otherwise(col(s"_r.$RescueCol")).as(RescueCol) :+
        col(PageCol)).toIndexedSeq: _*)
  }

  /** Probe-then-read convenience for count-envelope APIs: one driver
    * request to size the fetch, then the distributed read.
    */
  def readAll(spark: SparkSession, template: String, schema: StructType,
              pageSize: Int, countField: String,
              dataField: Option[String], timeoutMs: Int = 10000,
              retries: Int = 3): DataFrame = {
    val n = discoverPages(template, pageSize, countField, timeoutMs, retries)
    read(spark, template, n, schema, pageSize, dataField, timeoutMs, retries)
  }
}
