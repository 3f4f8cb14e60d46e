package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Frequent k-step behavioral paths — the sequence-mining question
  * q50's single-step transition matrix cannot answer: a Markov cell
  * says view→click is common, only the path table says
  * view→click→buy is the dominant 3-step road to conversion (vs
  * view→click→view loops). The navigation-analysis staple for
  * funnels-you-didn't-predeclare.
  *
  * Semantics: consecutive event-type trigrams per user ordered by
  * (ts, event_id) — the same total order as q50, so paths compose
  * exactly with its transitions; each user contributes n−2 trigrams;
  * top `k` paths by count with support = count / total trigrams,
  * ties broken by path string (deterministic both engines).
  *
  * Plan/scale: ONE per-user ordered window pass producing both lead
  * columns (fused by Catalyst into a single sort), then a
  * map-side-combined aggregate over at most |types|³ cells — the
  * result frame is vocabulary-sized, so the global top-k window ranks
  * a dimension-grade frame, not the corpus.
  */
object Paths {

  /** Top-k 3-step paths over an event frame. */
  def topPaths3(events: DataFrame, keyCol: String, tsCol: String,
                tieCol: String, typeCol: String, k: Int = 25): DataFrame = {
    val over = s"OVER (PARTITION BY $keyCol ORDER BY $tsCol, $tieCol)"
    val tri = events
      .select(col(keyCol), col(tsCol), col(tieCol), col(typeCol).as("t0"))
      .withColumn("t1", expr(s"lead(t0, 1) $over"))
      .withColumn("t2", expr(s"lead(t0, 2) $over"))
      .filter(col("t1").isNotNull && col("t2").isNotNull)
    // total via a global window over the vocabulary-sized cell frame —
    // NOT a separate aggregate + cross join, which would duplicate the
    // whole fact-scan subtree (Spark does not CSE repeated frames)
    val cells = tri.groupBy("t0", "t1", "t2")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_paths"))
    cells
      .withColumn("total", expr("CAST(sum(n_paths) OVER () AS BIGINT)"))
      .withColumn("path", concat_ws(">", col("t0"), col("t1"), col("t2")))
      .withColumn("rk",
        expr("row_number() OVER (ORDER BY n_paths DESC, path)"))
      .filter(col("rk") <= k)
      .selectExpr("rk", "path", "n_paths",
        "round(CAST(n_paths AS DOUBLE) / CAST(total AS DOUBLE), 4) + 0.0" +
          " AS support")
  }

  /** q128: the 25 most-travelled 3-step event-type paths. */
  def topUserPaths(spark: SparkSession, dir: String): DataFrame =
    topPaths3(Tables.events(spark, dir), "user_id", "ts", "event_id",
      "event_type")

  val topUserPathsSql: String =
    """WITH tri AS (
      |  SELECT event_type AS t0,
      |    lead(event_type, 1) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) AS t1,
      |    lead(event_type, 2) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) AS t2
      |  FROM events),
      |cells AS (
      |  SELECT t0, t1, t2, CAST(count(*) AS BIGINT) AS n_paths
      |  FROM tri WHERE t1 IS NOT NULL AND t2 IS NOT NULL
      |  GROUP BY 1, 2, 3),
      |tot AS (SELECT CAST(sum(n_paths) AS BIGINT) AS total FROM cells),
      |ranked AS (
      |  SELECT t0 || '>' || t1 || '>' || t2 AS path, n_paths, total,
      |    row_number() OVER (ORDER BY n_paths DESC, t0 || '>' || t1 || '>' || t2)
      |      AS rk
      |  FROM cells CROSS JOIN tot)
      |SELECT rk, path, n_paths,
      |  round(CAST(n_paths AS DOUBLE) / CAST(total AS DOUBLE), 4) + 0.0
      |    AS support
      |FROM ranked WHERE rk <= 25""".stripMargin
}
