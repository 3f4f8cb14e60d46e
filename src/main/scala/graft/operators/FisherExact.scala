package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Fisher's exact test on a 2×2 table — the EXACT member the
  * contingency deck is missing: q91's chi-square and q132's z are
  * asymptotic (their p is a lie when an expected cell drops below ~5),
  * and exactly those small-cell tables are where cohort-level release
  * decisions (one nation, one month, one rare segment) get made.
  * Conditioning on both margins, the table count a is hypergeometric:
  *
  *   P(a) = C(r1,a)·C(r2,c1−a) / C(N,c1)
  *
  * and the two-sided p sums P(k) over every k whose probability does
  * not exceed the observed table's (the fisher.test definition).
  *
  * Exactness: log-factorials are built as an integer cumulative sum of
  * 1e-9-snapped ln(i) terms — lf[n] is an exact BIGINT in nano-nats,
  * so every log-probability lp(k) is an exact integer and the
  * "P(k) ≤ P(a)" tail-inclusion test is an INTEGER comparison (no
  * floating tie-tolerance fudge like R's 1+1e-7). Each included
  * probability exp(lp/1e9) is 1e-12-floored and integer-summed
  * (order-free), one round-6 at display.
  *
  * Plan/scale: the corpus is touched ONCE (a 4-cell aggregate). The
  * log-factorial spine is an exploded sequence of COHORT length with
  * one single-partition cumulative window — this operator is for
  * cohort-grade tables (the only place an exact test means anything);
  * past ~10⁶ cohort rows the q91/q132 asymptotics are correct by
  * construction and this operator's spine cost is the signal to use
  * them. The k-sweep and its 4 spine joins are range-bounded
  * (≤ min(r1,c1) rows) and broadcast. */
object FisherExact {

  private def lnSnap(x: String): String =
    s"CAST(floor(ln($x) * 1e9 + 5e-1) AS DOUBLE) / 1e9"

  /** Per-k log-probability from the 4 spine lookups and the margin
    * constant: lp(k) in exact nano-nats. */
  private val LpSql =
    "(lf_r1 - lf_k - lf_r1k + lf_r2 - lf_c1k - lf_r2k - lf_const)"

  /** Fisher's exact test from a frame with boolean-int columns (x, y).
    * One row: (n_total, r1, c1, a_obs, or_sample, p_fisher). */
  def fisherExact(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    val counts = rows
      .filter(col("x").isNotNull && col("y").isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(x AS BIGINT)")).as("r1"),
        sum(expr("CAST(y AS BIGINT)")).as("c1"),
        sum(expr("CAST(x * y AS BIGINT)")).as("a"))
      .selectExpr("n", "r1", "c1", "a", "n - r1 AS r2")
      .localCheckpoint(true) // feeds the spine, the sweep, and display
    // integer log-factorial spine lf[0..n]: single-partition cumsum is
    // cohort-bounded by design (see scaladoc)
    val lf = counts
      .select(explode(expr("sequence(0, n)")).as("i"))
      .withColumn("t", expr(
        s"CASE WHEN i = 0 THEN CAST(0 AS BIGINT)" +
          s" ELSE CAST(floor(ln(CAST(i AS DOUBLE)) * 1e9 + 5e-1) AS BIGINT) END"))
      .withColumn("lf", sum("t").over(
        Window.orderBy("i").rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .select("i", "lf")
      .localCheckpoint(true) // reused by 5 lookups
    def look(as: String) =
      lf.selectExpr(s"i AS _i_$as", s"lf AS $as")
    val sweep = counts
      .select(col("n"), col("r1"), col("r2"), col("c1"), col("a"),
        explode(expr("sequence(greatest(0, c1 - r2), least(r1, c1))"))
          .as("k"))
      .join(broadcast(look("lf_k")), expr("k = _i_lf_k"))
      .join(broadcast(look("lf_r1k")), expr("r1 - k = _i_lf_r1k"))
      .join(broadcast(look("lf_c1k")), expr("c1 - k = _i_lf_c1k"))
      .join(broadcast(look("lf_r2k")), expr("r2 - c1 + k = _i_lf_r2k"))
      .join(broadcast(lf.selectExpr("i AS _i1", "lf AS lf_r1")), expr("r1 = _i1"))
      .join(broadcast(lf.selectExpr("i AS _i2", "lf AS lf_r2")), expr("r2 = _i2"))
      .join(broadcast(lf.selectExpr("i AS _i3", "lf AS lf_n")), expr("n = _i3"))
      .join(broadcast(lf.selectExpr("i AS _i4", "lf AS lf_c1")), expr("c1 = _i4"))
      .join(broadcast(lf.selectExpr("i AS _i5", "lf AS lf_nc1")), expr("n - c1 = _i5"))
      .withColumn("lf_const", expr("lf_n - lf_c1 - lf_nc1"))
      .select(col("n"), col("r1"), col("r2"), col("c1"), col("a"), col("k"),
        expr(LpSql).as("lp"))
      .localCheckpoint(true) // consumed by the observed row AND the tail
    val obs = sweep.filter(col("k") === col("a"))
      .select(col("lp").as("lp_obs"))
    sweep
      .crossJoin(broadcast(obs))
      .filter(col("lp") <= col("lp_obs"))
      .groupBy("n", "r1", "r2", "c1", "a")
      .agg(sum(expr(
        "CAST(floor(exp(CAST(lp AS DOUBLE) / 1e9) * 1e12) AS BIGINT)"))
        .as("s_p"))
      .selectExpr("n AS n_total", "r1", "c1", "a AS a_obs",
        "round(CAST(a * (r2 - c1 + a) AS DOUBLE)" +
          " / nullif(CAST((r1 - a) * (c1 - a) AS DOUBLE), 0.0), 6) + 0.0" +
          " AS or_sample",
        "round(CAST(s_p AS DOUBLE) / 1e12, 6) + 0.0 AS p_fisher")
  }

  /** q282: within the nation-0 customer cohort, is a negative account
    * balance associated with the BUILDING segment? Exactly the
    * cohort-grade cell counts where q91's asymptotics are shaky. */
  def nationBalanceFisher(spark: SparkSession, dir: String): DataFrame =
    fisherExact(Tables.customer(spark, dir)
      .filter(col("c_nationkey") === 0 && col("c_acctbal").isNotNull &&
        col("c_mktsegment").isNotNull)
      .selectExpr("CAST(c_mktsegment = 'BUILDING' AS INT) AS x",
        "CAST(c_acctbal < 0 AS INT) AS y"))

  /** DuckDB twin: identical 4-cell counts, integer spine, integer
    * tail-inclusion, floored probability sum. */
  val nationBalanceFisherSql: String =
    s"""WITH cohort AS (
       |  SELECT CAST(c_mktsegment = 'BUILDING' AS INT) AS x,
       |    CAST(c_acctbal < 0 AS INT) AS y
       |  FROM customer
       |  WHERE c_nationkey = 0 AND c_acctbal IS NOT NULL
       |    AND c_mktsegment IS NOT NULL),
       |counts AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS r1,
       |    CAST(sum(y) AS BIGINT) AS c1,
       |    CAST(sum(x * y) AS BIGINT) AS a,
       |    CAST(count(*) - sum(x) AS BIGINT) AS r2
       |  FROM cohort),
       |spine AS (
       |  SELECT i, CAST(sum(CASE WHEN i = 0 THEN 0
       |      ELSE CAST(floor(ln(CAST(i AS DOUBLE)) * 1e9 + 5e-1) AS BIGINT)
       |    END) OVER (ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS lf
       |  FROM (SELECT unnest(generate_series(0, (SELECT n FROM counts))) AS i)),
       |sweep AS (
       |  SELECT n, r1, r2, c1, a, k,
       |    s1.lf AS lf_k, s2.lf AS lf_r1k, s3.lf AS lf_c1k, s4.lf AS lf_r2k,
       |    sr1.lf AS lf_r1, sr2.lf AS lf_r2,
       |    sn.lf - sc1.lf - snc1.lf AS lf_const
       |  FROM (
       |    SELECT counts.*, unnest(generate_series(
       |      greatest(0, c1 - r2), least(r1, c1))) AS k
       |    FROM counts)
       |  JOIN spine s1 ON s1.i = k
       |  JOIN spine s2 ON s2.i = r1 - k
       |  JOIN spine s3 ON s3.i = c1 - k
       |  JOIN spine s4 ON s4.i = r2 - c1 + k
       |  JOIN spine sr1 ON sr1.i = r1
       |  JOIN spine sr2 ON sr2.i = r2
       |  JOIN spine sn ON sn.i = n
       |  JOIN spine sc1 ON sc1.i = c1
       |  JOIN spine snc1 ON snc1.i = n - c1),
       |lp AS (
       |  SELECT n, r1, r2, c1, a, k, $LpSql AS lp FROM sweep),
       |obs AS (SELECT lp AS lp_obs FROM lp WHERE k = a),
       |tail AS (
       |  SELECT n, r1, r2, c1, a,
       |    CAST(sum(CAST(floor(exp(CAST(lp AS DOUBLE) / 1e9) * 1e12)
       |      AS BIGINT)) AS BIGINT) AS s_p
       |  FROM lp CROSS JOIN obs
       |  WHERE lp <= lp_obs
       |  GROUP BY 1, 2, 3, 4, 5)
       |SELECT n AS n_total, r1, c1, a AS a_obs,
       |  round(CAST(a * (r2 - c1 + a) AS DOUBLE)
       |    / nullif(CAST((r1 - a) * (c1 - a) AS DOUBLE), 0.0), 6) + 0.0
       |    AS or_sample,
       |  round(CAST(s_p AS DOUBLE) / 1e12, 6) + 0.0 AS p_fisher
       |FROM tail""".stripMargin
}
