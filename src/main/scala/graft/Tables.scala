package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the star-schema testdata (TESTDATA.md).
  *
  * Plain `spark.read.parquet` so Catalyst sees a parquet relation it
  * can push filters and column pruning into. Dimension tables are tiny
  * relative to facts at any scale factor; operators broadcast them
  * explicitly where joined against facts.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.ts is parquet INT64 TIMESTAMP(NANOS) which Spark rejects by
    * default; read it as long nanos and rebuild a timestamp column.
    *
    * NOTE: the legacy flag is session-wide and intentionally NOT
    * restored — the DataFrame is lazy, so the conf must still hold at
    * execution time (a save/restore around the read would re-break the
    * scan when the query actually runs). Side effect: other
    * nanos-timestamp parquet reads in the session also arrive as LONG.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    apply(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
