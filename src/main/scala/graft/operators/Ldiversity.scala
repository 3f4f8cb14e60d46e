package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** l-diversity audit — the attribute-disclosure companion of q87's
  * k-anonymity. k-anonymity bounds RE-IDENTIFICATION (how many rows
  * share my quasi-identifier?), but a k-anonymous class whose sensitive
  * attribute is CONSTANT still leaks it to anyone who can place a
  * person in the class (Machanavajjhala 2007's homogeneity attack).
  * Distinct l-diversity counts the sensitive values per equivalence
  * class; entropy l-diversity strengthens it against skew — a class
  * that is 99% one value has l_distinct = 2 but entropy-l barely above
  * 1 (entropy_l = exp(H) is the effective number of values).
  *
  * Exactness: per-class entropy rides the q104 discipline verbatim —
  * cell counts are exact BIGINTs, each term cnt·ln(n/cnt) is 1e-9-snap
  * ln'd and floored to integer nano-nats, summed DECIMAL(38,0)
  * (order-free), so H = s/n/1e9 is an identical rational in both
  * engines; entropy_l = exp(H) then one round-6 (the pSql exp
  * precedent). The banded report's average is a per-class 1e-6 floor
  * then integer floor-division — no double ever sums across classes.
  *
  * Plan/scale: ONE map-side-combined cell aggregate (class × sensitive
  * value), one class-level aggregate, one banded rollup — the q87
  * shape with one extra value-level stage. Nothing after the first
  * aggregate exceeds class × value cardinality; at 100 TB the corpus
  * is touched once and no row-level join back ever happens.
  */
object Ldiversity {

  /** 1e-9-grid ln snap (q103/q104 discipline). */
  private def lnSnap(ratio: String): String =
    s"CAST(floor(ln($ratio) * 1e9 + 5e-1) AS DOUBLE) / 1e9"

  /** Per-cell entropy term over (cnt, n): floor(cnt·ln(n/cnt)·1e9). */
  private def hTerm(tpe: String): String =
    s"CAST(sum(CAST(floor(CAST(cnt AS DOUBLE) * (${lnSnap("CAST(n AS DOUBLE) / CAST(cnt AS DOUBLE)")}) * 1e9) AS $tpe)) AS $tpe)"

  /** Shared class-level tail: entropy_l from the nano-nat sum. */
  private val EntropySql =
    "exp(CAST(s_h AS DOUBLE) / CAST(n AS DOUBLE) / 1e9)"

  /** l-diversity audit of `sensitive` within `quasiIds` classes.
    * @return one row per distinct-l value: (l_distinct, n_groups,
    *         n_rows, min_entropy_l, avg_entropy_micro). */
  def lDiversity(df: DataFrame, quasiIds: Seq[String], sensitive: String): DataFrame = {
    val qids = quasiIds.map(col)
    val cells = df
      .filter(col(sensitive).isNotNull &&
        quasiIds.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(qids :+ col(sensitive).as("sv"): _*)
      .agg(count(lit(1)).as("cnt"))
    // class total rides a window so the entropy terms can reference it
    // inside the class aggregate (n is constant per class, so grouping
    // by it adds no cells)
    cells
      .withColumn("n", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy(qids: _*)))
      .groupBy(qids :+ col("n"): _*)
      .agg(
        count(lit(1)).as("l_distinct"),
        expr(hTerm("DECIMAL(38,0)")).as("s_h"))
      .selectExpr("l_distinct", "n",
        s"$EntropySql AS el")
      .groupBy("l_distinct")
      .agg(
        count(lit(1)).as("n_groups"),
        sum("n").as("n_rows"),
        min("el").as("min_el"),
        sum(expr("CAST(floor(el * 1e6) AS BIGINT)")).as("s_el"))
      .selectExpr("l_distinct", "n_groups", "n_rows",
        "round(min_el, 6) + 0.0 AS min_entropy_l",
        "s_el div n_groups AS avg_entropy_micro")
  }

  /** Sensitive-attribute band: account balance in 2000-unit bands —
    * coarse enough to be a realistic disclosure target, fine enough
    * that skew within a class shows up in entropy-l. */
  val BandSql = "CAST(floor(c_acctbal / 2000) AS BIGINT)"

  /** q278: l-diversity of the balance band within the q87
    * quasi-identifier classes (c_nationkey, c_mktsegment) — the two
    * audits together are the release decision: q87 says how many rows
    * are re-identifiable, this says what a re-identification learns. */
  def customerLdiversity(spark: SparkSession, dir: String): DataFrame =
    lDiversity(
      Tables.customer(spark, dir)
        .filter(col("c_acctbal").isNotNull)
        .withColumn("bal_band", expr(BandSql)),
      Seq("c_nationkey", "c_mktsegment"), "bal_band")

  val customerLdiversitySql: String =
    s"""WITH cells AS (
       |  SELECT c_nationkey, c_mktsegment, $BandSql AS sv,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM customer
       |  WHERE c_acctbal IS NOT NULL AND c_nationkey IS NOT NULL
       |    AND c_mktsegment IS NOT NULL
       |  GROUP BY 1, 2, 3),
       |wn AS (
       |  SELECT *, CAST(sum(cnt) OVER (
       |    PARTITION BY c_nationkey, c_mktsegment) AS BIGINT) AS n
       |  FROM cells),
       |classes AS (
       |  SELECT c_nationkey, c_mktsegment, n,
       |    count(*) AS l_distinct,
       |    ${hTerm("HUGEINT")} AS s_h
       |  FROM wn GROUP BY 1, 2, 3),
       |ent AS (
       |  SELECT l_distinct, n, $EntropySql AS el FROM classes)
       |SELECT l_distinct, count(*) AS n_groups,
       |  CAST(sum(n) AS BIGINT) AS n_rows,
       |  round(min(el), 6) + 0.0 AS min_entropy_l,
       |  CAST(sum(CAST(floor(el * 1e6) AS BIGINT)) AS BIGINT) // count(*)
       |    AS avg_entropy_micro
       |FROM ent GROUP BY 1""".stripMargin
}
