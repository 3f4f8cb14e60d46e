package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Salted-join equivalence audit — moves [[Skew.saltedJoin]] from
  * spec-verified to ORACLE-VERIFIED. The salting mechanics (content-
  * hash salt on the fact side, `buckets`× dimension explode, join on
  * (key, salt)) must be invisible in the result: this query runs the
  * REAL salted join over a fact-to-dimension edge and aggregates the
  * joined frame; the DuckDB twin is the plain unsalted join. A hash
  * match is the theorem — salting changed the shuffle layout and
  * nothing else. (The q234/q241 doctrine: every scale-path variant
  * ships with a registered proof of semantic equivalence.)
  *
  * Exactness: pure integers (row counts, summed cents) — any salt
  * leak, dropped key, or duplicated dimension row shifts an exact
  * BIGINT and fails the gate loudly.
  *
  * Plan/scale: the salted join spreads each supplier key over
  * [[Buckets]] reducers (the hot-key posture); the rollup is one
  * keyed aggregate on the nation dimension. */
object SaltedAudit {

  val Buckets = 8

  /** q296: lineitem revenue by supplier nation THROUGH the salted
    * join; the oracle computes the same rollup through a plain join. */
  def saltedRevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val fact = Tables.lineitem(spark, dir)
      .filter(col("l_suppkey").isNotNull && col("l_extendedprice").isNotNull)
      .selectExpr("l_suppkey AS sk",
        "CAST(floor(l_extendedprice * 1e2) AS BIGINT) AS cents")
    val dim = Tables.supplier(spark, dir)
      .selectExpr("s_suppkey AS sk", "s_nationkey")
    Skew.saltedJoin(fact, dim, "sk", Buckets)
      .groupBy("s_nationkey")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("n_rows"),
        expr("CAST(sum(cents) AS BIGINT)").as("cents_sum"))
  }

  /** DuckDB twin: the PLAIN join — equality is the point. */
  val saltedRevenueByNationSql: String =
    """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(floor(l_extendedprice * 1e2) AS BIGINT)) AS BIGINT)
      |    AS cents_sum
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |WHERE l_suppkey IS NOT NULL AND l_extendedprice IS NOT NULL
      |GROUP BY 1""".stripMargin
}
