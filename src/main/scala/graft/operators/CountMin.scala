package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Count–min sketch (Cormode & Muthukrishnan 2005) — the bounded-
  * memory frequency table beside [[Hll]]'s cardinality sketch and the
  * batch twin of the streaming Misra–Gries heavy-hitter summary
  * (#18e): d·w counters answer "how often does ANY term occur" with
  * the one-sided guarantee est ≥ true and est ≤ true + εN (ε = e/w)
  * with probability 1 − e^(−d) — at 100 TB the exact term-frequency
  * table is corpus-vocabulary-sized (billions of rows); the sketch is
  * d·w = 2048 integers, built by ONE map-side-combined aggregate and
  * MERGED across partitions/days by cell-wise ADDITION ([[merged]] —
  * sums commute, spec-pinned), which is what lets per-shard sketches
  * roll up without re-touching rows.
  *
  * EXACTNESS: the ENTIRE program is integer arithmetic — bucket =
  * hash48(di:term) % w, table cells exact BIGINT sums, the point
  * estimate a min over d exact cells. Nothing snaps, nothing rounds;
  * the oracle runs the identical program off the portable hash
  * recipe.
  *
  * Plan/scale: term cells first (the corpus touch — one aggregate),
  * then everything downstream is term-grade × d; the d·w table is
  * broadcast back for the probe join. The registered query q246
  * audits the top-K exact heavy hitters against their sketch reads
  * (the q234/q235/q245 audit pattern): `overestimate` ≥ 0 ALWAYS
  * (the CMS invariant), small when w ≫ vocabulary. */
object CountMin {

  /** Default depth (4 salted rows ⇒ failure prob e⁻⁴ ≈ 1.8%). */
  val D = 4
  /** Default width (512 buckets ⇒ ε = e/512 ≈ 0.53% of mass N). */
  val W = 512

  private def spine(df: DataFrame, d: Int) =
    df.sparkSession.range(d.toLong).selectExpr("CAST(id AS INT) AS di")

  /** CMS table (di, b, tot) from term cells (t STRING, c BIGINT). */
  def table(cells: DataFrame, d: Int = D, w: Int = W): DataFrame =
    cells.crossJoin(broadcast(spine(cells, d)))
      .select(col("di"),
        pmod(Hashing.hash48(
          concat(col("di").cast("string"), lit(":"), col("t"))), lit(w.toLong))
          .as("b"),
        col("c"))
      .groupBy("di", "b")
      .agg(expr("CAST(sum(c) AS BIGINT)").as("tot"))

  /** Cell-wise additive merge of two CMS tables (same d, w). */
  def merged(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("di", "b")
      .agg(expr("CAST(sum(tot) AS BIGINT)").as("tot"))

  /** Point estimates for every term in `terms` (t STRING) against a
    * table: est(t) = min over d of the term's d cells. */
  def estimates(terms: DataFrame, tbl: DataFrame,
                d: Int = D, w: Int = W): DataFrame =
    terms.crossJoin(broadcast(spine(terms, d)))
      .select(col("t"), col("di"),
        pmod(Hashing.hash48(
          concat(col("di").cast("string"), lit(":"), col("t"))), lit(w.toLong))
          .as("b"))
      .join(broadcast(tbl), Seq("di", "b"))
      .groupBy("t")
      .agg(expr("CAST(min(tot) AS BIGINT)").as("cms_est"))

  /** q246: the top-20 part keys by line count, exact vs CMS — the
    * heavy-hitter audit (election deterministic: count desc, key asc
    * over the term-grade cell frame). */
  def partkeyCms(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(spark, dir)
      .selectExpr("CAST(l_partkey AS STRING) AS t", "l_partkey AS k")
      .groupBy("t", "k")
      .agg(expr("CAST(count(1) AS BIGINT)").as("c"))
      .localCheckpoint(true) // three consumers: table, probe, election
    val tbl = table(cells.select("t", "c"))
    val top = cells
      .withColumn("rk", expr(
        "row_number() OVER (ORDER BY c DESC, k ASC)"))
      .filter(col("rk") <= 20)
    top.join(estimates(top.select("t"), tbl), "t")
      .selectExpr("k AS l_partkey", "c AS n_exact", "cms_est AS cms_estimate",
        "cms_est - c AS overestimate")
  }

  /** DuckDB twin of [[partkeyCms]]: identical integer program off the
    * portable hash recipe. */
  val partkeyCmsSql: String = {
    val bucket = Hashing.hash48Sql(
      "CAST(di AS VARCHAR) || ':' || t") + " % 512"
    s"""WITH cells AS (
       |  SELECT CAST(l_partkey AS VARCHAR) AS t, l_partkey AS k,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM lineitem GROUP BY 1, 2),
       |spine AS (SELECT CAST(range AS INT) AS di FROM range(4)),
       |tbl AS (
       |  SELECT di, $bucket AS b, CAST(sum(c) AS BIGINT) AS tot
       |  FROM cells CROSS JOIN spine GROUP BY 1, 2),
       |top AS (
       |  SELECT t, k, c,
       |    row_number() OVER (ORDER BY c DESC, k ASC) AS rk
       |  FROM cells QUALIFY rk <= 20),
       |probe AS (
       |  SELECT t, di, $bucket AS b FROM top CROSS JOIN spine),
       |est AS (
       |  SELECT t, CAST(min(tot) AS BIGINT) AS cms_est
       |  FROM probe JOIN tbl USING (di, b) GROUP BY 1)
       |SELECT k AS l_partkey, c AS n_exact, cms_est AS cms_estimate,
       |  cms_est - c AS overestimate
       |FROM top JOIN est USING (t)""".stripMargin
  }
}
