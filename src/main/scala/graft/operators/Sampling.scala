package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Deterministic stratified sampling — training-data curation's
  * "N% of each language / source / quality band" step, built to be
  * EXACTLY reproducible: membership is a pure function of the row key
  * (md5-derived hash threshold), never an RNG. Re-running the pipeline,
  * re-sampling after a re-crawl, or auditing a sample months later all
  * yield the identical row set — and the DuckDB oracle reproduces it
  * bit-for-bit, which `df.sample()`'s partition-seeded RNG cannot.
  *
  * Pure projection+filter: no shuffle at any scale; the per-stratum
  * fraction lookup is a literal CASE chain (strata counts are
  * dimension-grade).
  */
object Sampling {

  val Buckets = 1000000L

  /** Hash bucket in [0, Buckets) for a key column. */
  private def bucket(key: Column): Column =
    Hashing.hash48(key.cast("string")) % Buckets

  private def bucketSql(key: String): String =
    s"${Hashing.hash48Sql(s"($key)::VARCHAR")} % $Buckets"

  /** Integer bucket threshold for a fraction — computed ONCE on the
    * driver so both engines compare against the same exact literal.
    * Comparing against `fraction * Buckets` at query time would pit
    * Spark's double product against DuckDB's DECIMAL arithmetic, which
    * disagree on boundary buckets for fractions whose product rounds
    * (e.g. 0.00051 → 510.00000000000006 vs 510.00000). */
  private[graft] def thresholdFor(fraction: Double): Long =
    math.round(fraction * Buckets)

  /** Keep each row iff hash(key) falls under its stratum's fraction.
    * `fractions` maps stratum value → sampling fraction in [0, 1];
    * unlisted strata get `defaultFraction`. */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(lit(thresholdFor(defaultFraction))) {
      case (acc, (s, f)) => when(col(strataCol) === s, lit(thresholdFor(f))).otherwise(acc)
    }
    df.filter(bucket(col(keyCol)) < threshold)
  }

  // ---- q38: stratified customer sample by market segment ----

  val SegmentFractions: Seq[(String, Double)] = Seq(
    "AUTOMOBILE" -> 0.2, "BUILDING" -> 0.1, "FURNITURE" -> 0.05)
  val DefaultFraction = 0.02

  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    stratified(
      Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey")),
      "c_custkey", "c_mktsegment",
      SegmentFractions.toMap, DefaultFraction)

  val stratifiedSampleSql: String = {
    // chain order differs from the when-chain's fold, which is fine
    // because strata values are distinct; thresholds are the SAME
    // driver-computed integer literals the Spark plan carries
    val cases = SegmentFractions.map { case (s, f) =>
      s"WHEN c_mktsegment = '$s' THEN ${thresholdFor(f)}"
    }.mkString(" ")
    s"""SELECT c_custkey, c_mktsegment, c_nationkey
       |FROM customer
       |WHERE ${bucketSql("c_custkey")} <
       |  (CASE $cases ELSE ${thresholdFor(DefaultFraction)} END)""".stripMargin
  }
}
