package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Harrell's concordance index — "does the risk score actually rank
  * who churns FIRST?", the survival deck's answer to q83's AUC: AUC
  * needs a binary label at a fixed horizon and throws censored
  * subjects away; the C-index scores every usable pair under right
  * censoring — pair (i, j) is comparable iff i's EVENT is observed
  * strictly before j's last time; concordant iff the higher risk score
  * churned first; score ties count ½ (Harrell 1982).
  *
  * Exactness: fully integral — with scores on a grid, the pair counts
  * come from a dense (duration × score) cell lattice: n_after(d,s) =
  * subjects with dur > d at score s (suffix over the duration spine),
  * conc(d,s) = Σ_{s'<s} n_after(d,s') (prefix over the score spine),
  * comp(d) = Σ_s n_after(d,s); then
  *
  *   2·num = Σ_{event cells} e·(2·conc + n_after_ties)
  *   den   = Σ_{event cells} e·comp
  *   c_micro = (2·num · 1e6) div (2 · den)
  *
  * — one exact BIGINT chain, identical floor division in the twin.
  * (Longs hold while events·subjects·1e6 < 2^63 per group — past
  * ~3e6 rows/group swap the two sums for DECIMAL(38,0), the q83
  * technique, same plan.)
  *
  * Plan/scale: one keyed cell aggregate → dense lattice bounded by
  * DURATION RANGE × SCORE GRID per group (never subject count — both
  * spines are the q110/q48 adjudicated classes; the score `gridDiv`
  * is the 100 TB knob) → three lattice windows → one keyed finish. */
object Cindex {

  /** C-index per group from a frame with (g, dur, event, s): group
    * key, integer duration, 0/1 event, integer grid score (HIGHER
    * score = predicted HIGHER risk = earlier event). Returns one row
    * per group: (g, n_subjects, n_events, n_pairs, c_micro) —
    * c_micro NULL when no pair is comparable. */
  def cindex(obs: DataFrame): DataFrame = {
    val cells = obs.groupBy("g", "dur", "s")
      .agg(
        expr("CAST(count(1) AS BIGINT)").as("a"),
        expr("CAST(sum(event) AS BIGINT)").as("e"))
      .localCheckpoint(true) // feeds both spines and the lattice
    val spineD = cells.select("g", "dur").distinct()
    val spineS = cells.select("g", "s").distinct()
    val wSuffix = Window.partitionBy("g", "s").orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wPrefix = Window.partitionBy("g", "dur").orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wComp = Window.partitionBy("g", "dur")
    spineD.join(spineS, "g")
      .join(cells, Seq("g", "dur", "s"), "left")
      .withColumn("a0", coalesce(col("a"), lit(0L)))
      .withColumn("e0", coalesce(col("e"), lit(0L)))
      .withColumn("n_after", coalesce(sum("a0").over(wSuffix), lit(0L)))
      .withColumn("conc", coalesce(sum("n_after").over(wPrefix), lit(0L)))
      .withColumn("comp", sum("n_after").over(wComp))
      .groupBy("g")
      .agg(
        expr("CAST(sum(a0) AS BIGINT)").as("n_subjects"),
        expr("CAST(sum(e0) AS BIGINT)").as("n_events"),
        expr("CAST(sum(e0 * comp) AS BIGINT)").as("n_pairs"),
        expr("CAST(sum(e0 * (2 * conc + n_after)) AS BIGINT)").as("num2"))
      .selectExpr("g", "n_subjects", "n_events", "n_pairs",
        "CASE WHEN n_pairs > 0 THEN (num2 * 1000000) div (2 * n_pairs)" +
          " ELSE NULL END AS c_micro")
  }

  /** q186: does a customer's account balance rank lifetime-until-churn
    * within each segment? Risk score = NEGATIVE balance on the
    * hundred-dollar grid (poorer accounts predicted to churn sooner), over
    * the q110 observation frame (first→last-order duration, 90-day
    * censor anchor). */
  def balanceChurnCindex(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_custkey"),
        expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')")
          .as("d"))
      .groupBy("o_custkey")
      .agg(min("d").as("first_d"), max("d").as("last_d"))
      .localCheckpoint(true) // censor anchor AND observation frame
    val mx = perCust.agg(max("last_d").as("mx"))
    val obs = perCust
      .crossJoin(broadcast(mx))
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment", "c_acctbal")),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_mktsegment AS g",
        "CAST(last_d - first_d AS BIGINT) AS dur",
        "CASE WHEN last_d < mx - 90 THEN 1 ELSE 0 END AS event",
        "-CAST(floor(c_acctbal / 100.0) AS BIGINT) AS s")
    cindex(obs).withColumnRenamed("g", "c_mktsegment")
  }

  /** DuckDB twin: identical lattice, windows, and floor division. */
  val balanceChurnCindexSql: String =
    """WITH per_cust AS (
      |  SELECT o_custkey,
      |    min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS first_d,
      |    max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS last_d
      |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
      |mx AS (SELECT max(last_d) AS mx FROM per_cust),
      |obs AS (
      |  SELECT c_mktsegment AS g,
      |    CAST(last_d - first_d AS BIGINT) AS dur,
      |    CASE WHEN last_d < mx - 90 THEN 1 ELSE 0 END AS event,
      |    -CAST(floor(c_acctbal / 100.0) AS BIGINT) AS s
      |  FROM per_cust CROSS JOIN mx
      |  JOIN customer ON o_custkey = c_custkey),
      |cells AS (
      |  SELECT g, dur, s, CAST(count(*) AS BIGINT) AS a,
      |    CAST(sum(event) AS BIGINT) AS e
      |  FROM obs GROUP BY 1, 2, 3),
      |lattice AS (
      |  SELECT sd.g, sd.dur, ss.s,
      |    coalesce(cells.a, 0) AS a0, coalesce(cells.e, 0) AS e0
      |  FROM (SELECT DISTINCT g, dur FROM cells) sd
      |  JOIN (SELECT DISTINCT g, s FROM cells) ss ON sd.g = ss.g
      |  LEFT JOIN cells ON cells.g = sd.g AND cells.dur = sd.dur
      |    AND cells.s = ss.s),
      |suffixed AS (
      |  SELECT *, coalesce(CAST(sum(a0) OVER (PARTITION BY g, s
      |    ORDER BY dur DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |    0) AS n_after
      |  FROM lattice),
      |walked AS (
      |  SELECT *,
      |    coalesce(CAST(sum(n_after) OVER (PARTITION BY g, dur ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |      0) AS conc,
      |    CAST(sum(n_after) OVER (PARTITION BY g, dur) AS BIGINT) AS comp
      |  FROM suffixed),
      |agg AS (
      |  SELECT g, CAST(sum(a0) AS BIGINT) AS n_subjects,
      |    CAST(sum(e0) AS BIGINT) AS n_events,
      |    CAST(sum(e0 * comp) AS BIGINT) AS n_pairs,
      |    CAST(sum(e0 * (2 * conc + n_after)) AS BIGINT) AS num2
      |  FROM walked GROUP BY 1)
      |SELECT g AS c_mktsegment, n_subjects, n_events, n_pairs,
      |  CASE WHEN n_pairs > 0 THEN (num2 * 1000000) // (2 * n_pairs)
      |    ELSE NULL END AS c_micro
      |FROM agg""".stripMargin
}
