package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC relational source — the engine-side counterpart of the
  * reference's Postgres reads (`dashboard/app_data.R:1-10`
  * `dbConnect`/`dbGetQuery`).
  *
  * Scale: a single-connection JDBC read is a one-task scan; for any
  * table that matters, use [[readPartitioned]] so Spark opens
  * `numPartitions` parallel connections over non-overlapping
  * `partitionColumn` ranges. Filters/projections on the result are
  * pushed into the remote SQL by Spark's JDBC relation (visible as
  * PushedFilters in explain), so the database does the pruning.
  */
object Jdbc {

  private[graft] def props(options: Map[String, String]): Properties = {
    val p = new Properties()
    options.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Whole-table (or pushdown-subquery) read over one connection —
    * dimension-sized tables only. */
  def read(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, props(options))

  /** Range-partitioned parallel read: `numPartitions` connections, each
    * scanning one stride of `partitionColumn` ∈ [lower, upper]. This is
    * the only JDBC read shape that scales past one task. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long, numPartitions: Int,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper, numPartitions,
      props(options))
}
