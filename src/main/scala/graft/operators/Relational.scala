package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational operators (SURVEY.md §2 #1–16), each re-expressing a
  * behavior of the reference ETL (julestucher/mcas-question2-etl) as a
  * declarative Spark plan.
  *
  * Scale notes: every operator keeps the fact table (lineitem/orders)
  * on the probe side, prunes columns before shuffling, and aggregates
  * partially map-side (Catalyst does this for hash aggregates when the
  * plan is declarative). Doubles are rounded to 4 decimals at the
  * output boundary only, for oracle parity (SURVEY.md §5).
  */
object Relational {

  private def r4(c: Column): Column = round(c, 4)

  /** #1 Grouped aggregation — SUM/AVG/COUNT with derived expressions.
    * Reference: dashboard/app_data.R town rollup (SUM per county,town)
    * and get_school_analysis_data.sql AVG/SUM aggregates.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        r4(sum(col("l_quantity"))).as("sum_qty"),
        r4(sum(col("l_extendedprice"))).as("sum_base_price"),
        r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
        r4(avg(col("l_quantity"))).as("avg_qty"),
        r4(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
}
