package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV source with the reference's scraped-table cleaning built in
  * (SURVEY.md §2 #31).
  *
  * The reference parses scraped HTML tables where numbers arrive as
  * "1,234", "–" (en-dash) for missing, and names carry stray whitespace
  * (election_results_etl.py:96-109, school_outcomes_etl.py numeric
  * parsing). Those repairs belong in the source so every downstream
  * operator sees typed columns; they are plain Catalyst expressions
  * layered over the scan, so column pruning and (post-parse) filter
  * evaluation stay in one codegen stage — no per-row UDF cost.
  */
object CleaningCsv {

  /** Which repairs to apply per column group. */
  case class Options(
      numericCols: Seq[String] = Nil,   // "1,234" / "–" / "" → double (null when unparseable)
      trimCols: Seq[String] = Nil,      // strip outer whitespace
      titleCaseCols: Seq[String] = Nil, // title-case names (reference town names)
      header: Boolean = true,
      delimiter: String = ",")

  /** En-dash / em-dash / blank → null; commas stripped; try_cast keeps
    * ANSI mode on while mapping unparseable leftovers to null instead of
    * failing the job (scraped data always has one more surprise). */
  def cleanNumeric(c: Column): Column =
    nullif(regexp_replace(regexp_replace(trim(c), ",", ""), "^[–—-]$", ""), lit(""))
      .try_cast("double")

  def read(spark: SparkSession, path: String, opts: Options = Options()): DataFrame = {
    val raw = spark.read
      .option("header", opts.header.toString)
      .option("delimiter", opts.delimiter)
      .csv(path)
    val afterNumeric = opts.numericCols.foldLeft(raw) { (df, name) =>
      df.withColumn(name, cleanNumeric(col(name)))
    }
    val afterTrim = opts.trimCols.foldLeft(afterNumeric) { (df, name) =>
      df.withColumn(name, trim(col(name)))
    }
    opts.titleCaseCols.foldLeft(afterTrim) { (df, name) =>
      df.withColumn(name, initcap(lower(trim(col(name)))))
    }
  }
}
