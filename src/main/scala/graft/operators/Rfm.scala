package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** RFM segmentation — the classic customer-value decomposition:
  * Recency (days since last order), Frequency (order count), Monetary
  * (lifetime spend), each scored 1–5 by population quintile, plus a
  * rule-based segment label ("champions", "at_risk", …). The
  * marketing-analytics deliverable that q47's generic binning feeds.
  *
  * Scoring is CELL-BASED, not a global ntile: each metric collapses
  * to VALUE-LEVEL cells (recency is calendar-bounded, frequency
  * count-bounded, monetary quantized to WHOLE DOLLARS first — the
  * q47 quantize-first discipline, so cell count is bounded by the
  * value RANGE, never by customer count); the quintile is the exact
  * integer `1 + (5 · strictly_worse_count) div n`, ties sharing one
  * score. Scores join back as broadcast maps (dimension-grade by the
  * quantize precondition). Recency inverts the direction (recent =
  * good), so its score uses the strictly-LARGER cumulative.
  *
  * Exactness: metrics are exact integers (days / counts / floored
  * dollars); scores are integer arithmetic end-to-end; monetary is
  * displayed from exact cents with one shared division. */
object Rfm {

  /** Per-customer RFM frame with quintile scores and segment label.
    * `obs` columns: (k, rec, freq, mon_c) — integer recency, count,
    * cents. r10: the three metric cumulatives run BANDED
    * (BandedCumsum — per-task cap even where a metric's value range
    * saturates: recency calendar ~10³, frequency per-customer load,
    * monetary whole dollars ≲5·10⁶) and are CellGuard-ed — a caller
    * feeding an unquantized metric fails loudly instead of funneling
    * a customer-cardinality frame through one task. */
  def score(obs: DataFrame,
            maxCells: Long = CellGuard.DefaultMaxCells): DataFrame = {
    // customer-dimension frame consumed FIVE times (n + three metric
    // cell builds + the final score join): checkpoint so the upstream
    // fact aggregation runs once (no CSE across repeated frames)
    val o = obs.withColumn("mon_d", expr("mon_c div 100"))
      .localCheckpoint(true)
    // r10: each metric's global cumulative runs BANDED (BandedCumsum
    // with an empty partition — offsets live on the band dimension),
    // and the CellGuard rides a 1-row guard aggregate crossed in (the
    // q94 single-row-build convention) — no task ever holds a whole
    // metric's cell frame
    def cells(metric: String): DataFrame = {
      val c = o.groupBy(col(metric))
        .agg(expr("CAST(count(1) AS BIGINT)").as("cnt"))
        .localCheckpoint(true) // guard + the banded cumulative share it
      val guard = c.agg(count(lit(1)).as("n_cells"))
        .filter(expr(CellGuard.sqlGuard(s"rfm:$metric", "n_cells", maxCells)))
        .select(lit(1).as("__ok"))
      BandedCumsum.cumsum(c, Nil, metric, Seq("cnt"), inputCheckpointed = true)
        .withColumnRenamed("cum_cnt", "cum_le")
        .crossJoin(broadcast(guard))
        .drop("__ok")
    }
    val n = o.agg(expr("CAST(count(1) AS BIGINT)").as("n"))
    val rScores = cells("rec").crossJoin(broadcast(n))
      .selectExpr("rec", "CAST(1 + (5 * (n - cum_le)) div n AS INT) AS r_score")
    val fScores = cells("freq").crossJoin(broadcast(n))
      .selectExpr("freq", "CAST(1 + (5 * (cum_le - cnt)) div n AS INT) AS f_score")
    val mScores = cells("mon_d").crossJoin(broadcast(n))
      .selectExpr("mon_d", "CAST(1 + (5 * (cum_le - cnt)) div n AS INT) AS m_score")
    o
      .join(broadcast(rScores), "rec")
      .join(broadcast(fScores), "freq")
      .join(broadcast(mScores), "mon_d")
      .selectExpr("k", "rec AS recency_d", "freq AS frequency",
        "round(CAST(mon_c AS DOUBLE) / 1e2, 2) + 0.0 AS monetary",
        "r_score", "f_score", "m_score",
        "CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champions'" +
          " WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'" +
          " WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'" +
          " WHEN f_score >= 4 THEN 'loyal'" +
          " WHEN m_score >= 4 THEN 'big_spender'" +
          " ELSE 'regular' END AS segment")
  }

  /** The `score` cells for monetary require whole-dollar quantization;
    * this builds the observation frame from orders: recency against
    * the dataset's final order date, lifetime order count, lifetime
    * spend in exact cents. */
  def customerRfm(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .groupBy(col("o_custkey").as("k"))
      .agg(
        expr("max(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01'))")
          .as("last_d"),
        expr("CAST(count(1) AS BIGINT)").as("freq"),
        expr("CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT)")
          .as("mon_c"))
      // reused by the recency anchor AND the score frame: checkpoint
      // so orders aggregates once
      .localCheckpoint(true)
    val mx = perCust.agg(max("last_d").as("mx"))
    score(perCust.crossJoin(broadcast(mx))
      .selectExpr("k", "CAST(mx - last_d AS BIGINT) AS rec", "freq", "mon_c"))
      .withColumnRenamed("k", "o_custkey")
  }

  val customerRfmSql: String =
    """WITH per_cust AS (
      |  SELECT o_custkey AS k,
      |    max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS last_d,
      |    CAST(count(*) AS BIGINT) AS freq,
      |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS mon_c
      |  FROM orders
      |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
      |  GROUP BY 1),
      |mx AS (SELECT max(last_d) AS mx FROM per_cust),
      |obs AS (
      |  SELECT k, CAST(mx - last_d AS BIGINT) AS rec, freq, mon_c,
      |    mon_c // 100 AS mon_d
      |  FROM per_cust CROSS JOIN mx),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM obs),
      |r_cells AS (
      |  SELECT rec, CAST(1 + (5 * (n - cum_le)) // n AS INT) AS r_score
      |  FROM (SELECT rec, CAST(count(*) AS BIGINT) AS cnt,
      |          sum(count(*)) OVER (ORDER BY rec
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_le
      |        FROM obs GROUP BY 1) CROSS JOIN n),
      |f_cells AS (
      |  SELECT freq, CAST(1 + (5 * (cum_le - cnt)) // n AS INT) AS f_score
      |  FROM (SELECT freq, CAST(count(*) AS BIGINT) AS cnt,
      |          sum(count(*)) OVER (ORDER BY freq
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_le
      |        FROM obs GROUP BY 1) CROSS JOIN n),
      |m_cells AS (
      |  SELECT mon_d, CAST(1 + (5 * (cum_le - cnt)) // n AS INT) AS m_score
      |  FROM (SELECT mon_d, CAST(count(*) AS BIGINT) AS cnt,
      |          sum(count(*)) OVER (ORDER BY mon_d
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_le
      |        FROM obs GROUP BY 1) CROSS JOIN n)
      |SELECT k AS o_custkey, rec AS recency_d, freq AS frequency,
      |  round(CAST(mon_c AS DOUBLE) / 1e2, 2) + 0.0 AS monetary,
      |  r_score, f_score, m_score,
      |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champions'
      |    WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
      |    WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
      |    WHEN f_score >= 4 THEN 'loyal'
      |    WHEN m_score >= 4 THEN 'big_spender'
      |    ELSE 'regular' END AS segment
      |FROM obs
      |JOIN r_cells USING (rec)
      |JOIN f_cells USING (freq)
      |JOIN m_cells USING (mon_d)""".stripMargin
}
