package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** HTML-table extraction source — the engine form of the reference's
  * actual extract step (`school_outcomes_scraper.py` /
  * `election_results_etl.py` scrape `<table>` markup into frames; the
  * network fetch is out of scope for an engine, the PARSE is not).
  * Reads saved HTML files and extracts tables into rows — a
  * `pandas.read_html`-lite built entirely from codegen'd regexp
  * expressions (no UDFs, no driver-side parsing), so a directory of
  * millions of crawled pages parses as a plain distributed scan.
  *
  * Structure pass: `(?is)`-flagged lazy regexes peel `<table>` →
  * `<tr>` → `<td>/<th>` spans; cell text is tag-stripped, basic
  * entities are decoded, whitespace trimmed. This handles the
  * machine-generated markup export pipelines actually emit; documents
  * relying on implicit tag closure or nested tables inside cells are
  * outside the contract (the innermost table wins there, as with any
  * non-backtracking span extraction).
  *
  * Mapping pass ([[readTable]]): header names come from each table's
  * first row AT RUNTIME, so schema fields are matched by
  * `array_position` against the lower-cased header — column order in
  * the HTML does not matter and may differ per file. A data row whose
  * arity disagrees with its header, or whose table lacks a requested
  * column, lands in the `_malformed` rescue column as an all-null row
  * (the [[JsonLines]]/[[GeoJson]] quarantine contract). Values stay
  * strings — chain [[CleaningCsv]]-style cleaners for typing.
  */
object HtmlTables {

  val RescueCol = "_malformed"

  private val TableRe = "(?is)<table[^>]*>(.*?)</table>"
  private val RowRe = "(?is)<tr[^>]*>(.*?)</tr>"
  private val CellRe = "(?is)<t[dh][^>]*>(.*?)</t[dh]>"

  /** Strip residual tags, decode the common entities, collapse/trim
    * whitespace — one cell's text content. */
  private def cellText(c: Column): Column = {
    val noTags = regexp_replace(c, "(?s)<[^>]*>", "")
    // &amp; decodes LAST: doing it first re-decodes entities it just
    // produced (&amp;lt; must become the literal "&lt;", not "<")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Structure pass: one row per `<tr>`, with its parsed cell texts.
    * Output: (file, table_idx, row_idx, cells array<string>, raw_row).
    * row_idx 1 is the table's first row (the header row by the usual
    * export convention [[readTable]] applies). */
  def readCells(spark: SparkSession, path: String): DataFrame =
    cellsOf(spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("file"), col("value")))

  /** The same structure pass over an ALREADY-FETCHED page frame
    * (file STRING provenance, value STRING html) — the entry point
    * [[FormPost]] and other fetching sources parse through, so every
    * HTML-bearing source shares ONE table grammar. */
  def cellsOf(pages: DataFrame): DataFrame =
    pages
      .select(col("file"),
        posexplode(regexp_extract_all(col("value"), lit(TableRe), lit(1)))
          .as(Seq("t0", "table_html")))
      .select(col("file"), (col("t0") + 1).as("table_idx"),
        posexplode(regexp_extract_all(col("table_html"), lit(RowRe), lit(1)))
          .as(Seq("r0", "raw_row")))
      .select(col("file"), col("table_idx"), (col("r0") + 1).as("row_idx"),
        transform(regexp_extract_all(col("raw_row"), lit(CellRe), lit(1)),
          c => cellText(c)).as("cells"),
        col("raw_row"))

  /** Mapping pass: header-matched, schema-named extraction of every
    * table in every file under `path`. Fields are matched
    * case-insensitively against each table's first-row cells; data
    * rows follow with `_malformed` quarantine (arity mismatch or a
    * missing requested column). All values are strings regardless of
    * the declared field types' eventual use — typing is the caller's
    * cleaning step. */
  def readTable(spark: SparkSession, path: String, schema: StructType): DataFrame =
    tableOf(readCells(spark, path), schema)

  /** The mapping pass over a pre-parsed cells frame ([[cellsOf]]'s
    * output) — shared with [[FormPost]]. */
  def tableOf(all: DataFrame, schema: StructType): DataFrame = {
    val headers = all.filter(col("row_idx") === 1)
      .select(col("file"), col("table_idx"),
        transform(col("cells"), c => lower(c)).as("header"))
    val rows = all.filter(col("row_idx") > 1)
      .join(headers, Seq("file", "table_idx"))
    val fieldCols = schema.fieldNames.toSeq.map { n =>
      val idx = array_position(col("header"), lit(n.toLowerCase))
      (n, idx, when(idx > 0 && size(col("cells")) >= idx.cast("int"),
        element_at(col("cells"), idx.cast("int"))))
    }
    val ok = size(col("cells")) === size(col("header")) &&
      fieldCols.map { case (_, idx, _) => idx > 0 }.reduce(_ && _)
    rows.select(
      Seq(col("file"), col("table_idx"), col("row_idx")) ++
        fieldCols.map { case (n, _, v) => when(ok, v).as(n) } :+
        when(!ok, col("raw_row")).as(RescueCol): _*)
  }
}
