package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) source — the lingua franca of LLM
  * training-data interchange (one document object per line, shardable
  * by byte range, append-friendly). The reference ingests scraped JSON
  * via pandas (`school_outcomes_scraper.py` writes JSON payloads);
  * at corpus scale the same ingestion is a schema-enforced parallel
  * line scan.
  *
  * Design points for 100 TB:
  *   - an EXPLICIT schema is required — schema inference reads the
  *     whole input once before the real scan (twice the IO), and a
  *     drifting upstream field silently changes inferred types between
  *     deliveries; pinning the schema turns drift into visible nulls /
  *     quarantined rows instead;
  *   - malformed lines never kill the job: PERMISSIVE mode keeps them,
  *     typed as nulls, with the raw line preserved in a rescue column
  *     for quarantine ([[readWithRescue]]) — mirroring the cleaning
  *     philosophy of [[CleaningCsv]];
  *   - strict mode ([[readStrict]]) drops malformed lines instead, for
  *     pipelines that prefer loss over quarantine review.
  */
object JsonLines {

  val RescueCol = "_malformed"

  /** Schema-enforced JSONL read; malformed lines arrive as all-null
    * rows with the raw text in the `_malformed` rescue column (null for
    * good rows — filter on it to quarantine).
    *
    * CAVEAT (Spark restriction, SPARK-21610): a query that references
    * ONLY the rescue column over the raw source is rejected by the
    * analyzer — `df.filter(col("_malformed").isNotNull).count()` throws
    * unless the frame is cached first or the projection also touches a
    * data column. Quarantine flows should `.cache()` the read (they
    * consume both halves anyway) or select data columns alongside. */
  def readWithRescue(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(RescueCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", RescueCol)
      .json(path)

  /** Schema-enforced JSONL read dropping malformed lines. */
  def readStrict(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .json(path)

  /** JSONL writer (one object per line, text-partitioned like any
    * other sink — `to_json` over a struct of every column). Used by the
    * round-trip spec; gzip-friendly at scale via codec option. */
  def write(df: DataFrame, path: String, codec: Option[String] = None): Unit = {
    val writer = df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
      .write.mode("overwrite")
    codec.fold(writer)(c => writer.option("compression", c)).text(path)
  }
}
