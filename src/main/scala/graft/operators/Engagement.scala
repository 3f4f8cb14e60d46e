package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Lx engagement histogram — the INTENSITY complement of q303's
  * ledger. MAU counts who showed up at all; the L28 histogram (how
  * many of the trailing 28 days was each user active?) is the
  * engagement-quality curve product teams steer by: a hump near 28 is
  * a daily habit, mass at 1–2 is drive-by traffic, and the curve's
  * drift is visible long before MAU moves.
  *
  * Exactness: pure integers — the anchor day is the corpus's last
  * event day (deterministic), active days are distinct calendar days
  * in (anchor−27 .. anchor], the histogram is one count per L value.
  *
  * Plan/scale: one scan → distinct (user, day) cells in the window
  * (filter BEFORE the distinct — the trailing window prunes at the
  * scan) → per-user counts → a ≤28-row histogram. */
object Engagement {

  val WindowDays = 28

  /** q308: the L28 histogram over event activity:
    * (active_days, n_users, user_share_ppm). */
  def l28Histogram(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .selectExpr("user_id",
        "datediff(CAST(ts AS DATE), DATE'1970-01-01') AS d")
    val anchor = ev.agg(max("d").as("d_max"))
    val perUser = ev
      .crossJoin(broadcast(anchor))
      .filter(expr(s"d > d_max - $WindowDays"))
      .select("user_id", "d").distinct()
      .groupBy("user_id")
      .agg(expr("CAST(count(1) AS BIGINT)").as("active_days"))
    perUser
      .groupBy("active_days")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_users"))
      .crossJoin(broadcast(perUser
        .agg(expr("CAST(count(1) AS BIGINT)").as("n_tot"))))
      .selectExpr("active_days", "n_users",
        "n_users * 1000000 div n_tot AS user_share_ppm")
  }

  val l28HistogramSql: String =
    s"""WITH ev AS (
       |  SELECT user_id,
       |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
       |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
       |anchor AS (SELECT max(d) AS d_max FROM ev),
       |per_user AS (
       |  SELECT user_id, CAST(count(DISTINCT d) AS BIGINT) AS active_days
       |  FROM ev CROSS JOIN anchor
       |  WHERE d > d_max - $WindowDays
       |  GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM per_user)
       |SELECT active_days, CAST(count(*) AS BIGINT) AS n_users,
       |  CAST(count(*) AS BIGINT) * 1000000 // n_tot AS user_share_ppm
       |FROM per_user CROSS JOIN tot
       |GROUP BY active_days, n_tot""".stripMargin
}
