package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** XML record extraction source — the interchange format of the
  * largest public text corpora (Wikipedia/Wikimedia dumps are one
  * giant `<page>` stream; RSS/Atom feeds and sitemap indexes are the
  * crawl-frontier inputs). Same design contract as [[HtmlTables]]:
  * everything is codegen'd regexp expressions over a distributed scan
  * — no UDFs, no driver-side parsing, no DOM — which handles the
  * machine-generated, non-recursive markup dump pipelines emit.
  * Documents needing full XML semantics (namespaces, nested same-name
  * elements, attribute-ordered records) are outside the contract.
  *
  * Two read shapes:
  *  - [[readRecords]]: wholetext per file → explode `<tag>…</tag>`
  *    spans. Right when records are small and files are many (feeds,
  *    API payload archives).
  *  - [[readRecordsSplit]]: `lineSep = "</tag>"` chunked read — Hadoop
  *    splits the file at delimiter boundaries, so ONE multi-TB dump
  *    file parallelizes across the cluster without a pre-split step
  *    (the Wikipedia-dump shape). Each chunk carries exactly one
  *    record's open tag; the trailer chunk (no open tag) is dropped.
  *
  * Field mapping ([[readFields]]): per requested field, the FIRST
  * `<field>…</field>` span inside the record, CDATA unwrapped, basic
  * entities decoded, whitespace preserved (XML is content, not layout
  * — only entity decode is applied, unlike HTML cells). A field whose
  * tag is absent is null; a record containing NONE of the requested
  * fields goes to the `_malformed` rescue column with its raw span
  * (the [[JsonLines]]/[[GeoJson]]/[[HtmlTables]] quarantine
  * contract). Values stay strings — typing is the caller's cleaning
  * step.
  */
object XmlRecords {

  val RescueCol = "_malformed"

  /** `<tag …>inner</tag>` span (records and fields share the shape). */
  private def spanRe(tag: String) = s"(?is)<$tag(?:\\s[^>]*)?>(.*?)</$tag>"
  private def recordRe(tag: String) = spanRe(tag)
  private def fieldRe(tag: String) = spanRe(tag)
  private def fieldHitRe(tag: String) = s"(?is)<$tag(?:\\s[^>]*)?>"

  /** CDATA unwrap + entity decode (amp LAST — see HtmlTables). */
  private def fieldText(c: Column): Column = {
    val cdata = regexp_replace(c, "(?s)<!\\[CDATA\\[(.*?)\\]\\]>", "$1")
    Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(cdata) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }
  }

  /** Wholetext shape: (file, record_idx, record_xml) — record_xml is
    * the INNER span of the record element. */
  def readRecords(spark: SparkSession, path: String, recordTag: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("file"), col("value"))
      .select(col("file"),
        posexplode(regexp_extract_all(col("value"), lit(recordRe(recordTag)), lit(1)))
          .as(Seq("i0", "record_xml")))
      .select(col("file"), (col("i0") + 1).cast("long").as("record_idx"),
        col("record_xml"))

  /** Splittable shape for one giant dump file: chunk at `</tag>`, keep
    * chunks that contain an open tag, take the span after it. Chunk
    * order within a file is the split order, so `record_idx` here is
    * per-chunk monotone only per split — callers needing global order
    * sort on an extracted id field (e.g. the dump's own `<id>`). */
  def readRecordsSplit(spark: SparkSession, path: String, recordTag: String): DataFrame =
    spark.read.option("lineSep", s"</$recordTag>").text(path)
      .filter(col("value").rlike(fieldHitRe(recordTag)))
      .select(monotonically_increasing_id().as("record_idx"),
        regexp_extract(col("value"), s"(?is)<$recordTag(?:\\s[^>]*)?>(.*)", 1)
          .as("record_xml"))

  /** Field-mapped read over [[readRecords]] output (or
    * [[readRecordsSplit]] — pass its frame via `records`). */
  def mapFields(records: DataFrame, schema: StructType): DataFrame = {
    val fieldCols = schema.fieldNames.toSeq.map { n =>
      val present = col("record_xml").rlike(fieldHitRe(n))
      (n, present,
        when(present, fieldText(regexp_extract(col("record_xml"), fieldRe(n), 1))))
    }
    val ok = fieldCols.map(_._2).reduce(_ || _) // ≥1 requested field present
    records.select(
      records.columns.filter(_ != "record_xml").toSeq.map(col) ++
        fieldCols.map { case (n, _, v) => when(ok, v).as(n) } :+
        when(!ok, col("record_xml")).as(RescueCol): _*)
  }

  /** One-call wholetext read: extract `schema`'s fields from every
    * `<recordTag>` record in every file under `path`. */
  def readFields(spark: SparkSession, path: String, recordTag: String,
      schema: StructType): DataFrame =
    mapFields(readRecords(spark, path, recordTag), schema)
}
