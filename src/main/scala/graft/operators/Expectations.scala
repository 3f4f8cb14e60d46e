package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality expectation checks — the engine form of the
  * reference's validation asserts (pandas `validate='1:1'` merges in
  * school_outcomes_etl.py, the `stopifnot`-style asserts in
  * app_data.R), generalized into a dbt-/Great-Expectations-style
  * report: each check contributes a violation count and a pass flag,
  * all computed in ONE map-side-combined aggregate pass over the fact
  * (a 100 TB table is scanned once no matter how many checks run).
  */
object Expectations {

  /** A named expectation: `violation` must evaluate to 1L on a failing
    * row and 0L on a passing one. */
  case class Check(name: String, violation: Column)

  def notNull(name: String, c: Column): Check =
    Check(name, when(c.isNull, 1L).otherwise(0L))
  def inRange(name: String, c: Column, lo: Column, hi: Column): Check =
    Check(name, when(c.isNull || c < lo || c >= hi, 1L).otherwise(0L))
  def inSet(name: String, c: Column, allowed: Seq[String]): Check =
    Check(name, when(!c.isin(allowed.map(lit): _*), 1L).otherwise(0L))

  /** Run row-level checks plus an optional uniqueness check in one
    * aggregate; report (check_name, n_violations, pass) per check. */
  def report(df: DataFrame, checks: Seq[Check],
      uniqueKey: Option[(String, Column)] = None): DataFrame = {
    require(checks.nonEmpty || uniqueKey.nonEmpty,
      "report() needs at least one Check or a uniqueKey — an empty " +
        "expectation suite has nothing to aggregate")
    val aggCols = checks.map(c => sum(c.violation).as(s"c_${c.name}")) ++
      uniqueKey.map { case (n, k) =>
        (count(lit(1)) - countDistinct(k)).as(s"c_$n")
      }
    val names = checks.map(_.name) ++ uniqueKey.map(_._1)
    val stackArgs = names.map(n => s"'$n', coalesce(c_$n, 0L)").mkString(", ")
    df.agg(aggCols.head, aggCols.tail: _*)
      .select(expr(
        s"stack(${names.size}, $stackArgs) AS (check_name, n_violations)"))
      .withColumn("pass", (col("n_violations") === 0).cast("int"))
  }

  /** Registered q53: the orders-table contract. One check
    * (`price_under_400k`) is deliberately tight so the report carries
    * real violation counts, not only zeros. */
  def orderExpectations(spark: SparkSession, dir: String): DataFrame =
    report(Tables.orders(spark, dir),
      Seq(
        notNull("key_not_null", col("o_orderkey")),
        notNull("custkey_not_null", col("o_custkey")),
        inRange("price_range", col("o_totalprice"), lit(0.0), lit(1000000.0)),
        inRange("price_under_400k", col("o_totalprice"), lit(0.0), lit(400000.0)),
        inSet("status_domain", col("o_orderstatus"), Seq("F", "O", "P")),
        inRange("date_range", col("o_orderdate"),
          lit("1992-01-01").cast("timestamp"), lit("2002-01-01").cast("timestamp"))),
      uniqueKey = Some("key_unique" -> col("o_orderkey")))

  val orderExpectationsSql: String = {
    def check(name: String, cond: String): String =
      s"""SELECT '$name' AS check_name,
         |  CAST(coalesce(sum(CASE WHEN $cond THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations
         |FROM orders""".stripMargin
    val rows = Seq(
      check("key_not_null", "o_orderkey IS NULL"),
      check("custkey_not_null", "o_custkey IS NULL"),
      check("price_range",
        "o_totalprice IS NULL OR o_totalprice < 0.0 OR o_totalprice >= 1000000.0"),
      check("price_under_400k",
        "o_totalprice IS NULL OR o_totalprice < 0.0 OR o_totalprice >= 400000.0"),
      check("status_domain", "o_orderstatus NOT IN ('F', 'O', 'P')"),
      check("date_range",
        "o_orderdate IS NULL OR o_orderdate < TIMESTAMP '1992-01-01' OR o_orderdate >= TIMESTAMP '2002-01-01'"),
      """SELECT 'key_unique' AS check_name,
        |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
        |FROM orders""".stripMargin,
    ).map(_.replace("\n", " ")).mkString("\nUNION ALL\n")
    s"""SELECT check_name, n_violations,
       |  CAST(n_violations = 0 AS INT) AS pass
       |FROM (
       |$rows
       |)""".stripMargin
  }
}
