package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Two-sample randomization (permutation) test — the assumption-free
  * companion to q96's Welch t: under H₀ (labels exchangeable), the
  * observed |mean_A − mean_B| is compared against the statistic's
  * distribution over random relabelings; p = (1 + #{b : |T_b| ≥
  * |T_obs|}) / (B + 1) is exactly valid for ANY statistic, no
  * normality, no large-n (Fisher; the +1s make it conservative at
  * finite B).
  *
  * Determinism (the q144 discipline lifted to LABELS): relabeling b
  * assigns row k to pseudo-group A iff hash48("150:b:k") mod n < n_A —
  * a pure function of (key, b), so both engines reproduce every
  * resample bit-for-bit and re-runs/audits get the identical p. This
  * is the binomial-marginal randomization variant (group sizes vary
  * hypergeometrically around n_A, the standard Monte-Carlo trade; the
  * test stays exactly level-α because the relabeling distribution is
  * label-invariant).
  *
  * Exactness: group sums are exact integer cents; each T_b is ONE
  * shared-text double expression from integers; the extreme-count
  * comparison runs on those identical doubles; p is one integer ratio.
  *
  * Plan/scale: one scan → checkpoint → dimension-grade obs/count
  * frames (1 row, broadcast) → ×B sequence-explode (the
  * randomization's intrinsic cost — size B to your budget) → ONE
  * map-side-combined per-b aggregate (CASE sums — no join, no
  * shuffle on data keys) → B-row extreme count. Nothing corpus-sized
  * ever concentrates.
  */
object Permutation {

  /** Resamples. */
  val B = 200
  /** Hash-family seed. */
  val Seed = 150

  /** The shared-text statistic: difference of means in dollars. */
  private def tSql(sa: String, na: String, sb: String, nb: String): String =
    s"CAST($sa AS DOUBLE) / ($na) / 100.0 - CAST($sb AS DOUBLE) / ($nb) / 100.0"

  /** q150: is mean totalprice different between finished ('F') and
    * open ('O') orders — exact deterministic randomization p. */
  def orderPricePermTest(spark: SparkSession, dir: String,
      b: Int = B): DataFrame = {
    val rows = Tables.orders(spark, dir)
      .filter(col("o_totalprice").isNotNull &&
        col("o_orderstatus").isin("F", "O"))
      .select(col("o_orderkey").as("k"),
        (col("o_orderstatus") === "F").cast("int").as("isA"),
        expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)").as("xc"))
      .localCheckpoint(true) // obs aggregate + the ×B explode read it
    val obs = rows.agg(
      sum(col("isA")).cast("long").as("n_a"),
      sum(expr("CASE WHEN isA = 1 THEN xc ELSE 0 END")).as("s_a"),
      sum(lit(1) - col("isA")).cast("long").as("n_b"),
      sum(expr("CASE WHEN isA = 0 THEN xc ELSE 0 END")).as("s_b"))
      .selectExpr("n_a", "n_b",
        s"abs(${tSql("s_a", "n_a", "s_b", "n_b")}) AS t_obs_abs")
    // ONE digest + one key encode per ROW for the whole ×B family
    // (posexplode pos = b), not per (row, b) pair — value-identical to
    // hash48(Seed, concat(b, ":", k)), pinned by Hash48SeqSpec; the
    // DuckDB twin keeps the per-pair portable recipe
    val perB = Bootstrap.spread(rows)
      .select(col("xc"),
        posexplode(Hashing.hash48Seq(Seed, b, col("k").cast("string")))
          .as(Seq("b", "h")))
      .crossJoin(broadcast(obs.select(col("n_a").as("na0"),
        (col("n_a") + col("n_b")).as("n0"))))
      .withColumn("inA", (col("h") % col("n0") < col("na0")).cast("int"))
      .groupBy("b")
      .agg(sum(col("inA")).cast("long").as("pna"),
        sum(expr("CASE WHEN inA = 1 THEN xc ELSE 0 END")).as("psa"),
        sum(lit(1) - col("inA")).cast("long").as("pnb"),
        sum(expr("CASE WHEN inA = 0 THEN xc ELSE 0 END")).as("psb"))
      // an all-one-side relabeling (possible only at toy n) is skipped:
      // the statistic is undefined there, and the +1 numerator keeps
      // the p-value valid for skipped resamples
      .filter(col("pna") > 0 && col("pnb") > 0)
      .selectExpr("b", s"abs(${tSql("psa", "pna", "psb", "pnb")}) AS t_abs")
    perB.crossJoin(broadcast(obs))
      .groupBy("n_a", "n_b", "t_obs_abs")
      .agg(count(lit(1)).cast("long").as("n_resamples"),
        sum(expr("CASE WHEN t_abs >= t_obs_abs THEN 1 ELSE 0 END"))
          .cast("long").as("n_extreme"))
      .selectExpr("n_a", "n_b", "round(t_obs_abs, 4) + 0.0 AS t_obs_abs",
        "n_resamples", "n_extreme",
        "round(CAST(1 + n_extreme AS DOUBLE)" +
          " / CAST(1 + n_resamples AS DOUBLE), 6) + 0.0 AS p_value")
  }

  /** DuckDB twin: identical relabel rule, sums, statistic text. */
  val orderPricePermTestSql: String = {
    val h = Hashing.hash48Sql(Seed, "(b)::VARCHAR || ':' || (k)::VARCHAR")
    s"""WITH rows_ AS (
       |  SELECT o_orderkey AS k,
       |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS isA,
       |    CAST(floor(o_totalprice * 100.0) AS BIGINT) AS xc
       |  FROM orders
       |  WHERE o_totalprice IS NOT NULL AND o_orderstatus IN ('F', 'O')),
       |obs AS (
       |  SELECT CAST(sum(isA) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN isA = 1 THEN xc ELSE 0 END) AS BIGINT) AS s_a,
       |    CAST(sum(1 - isA) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN isA = 0 THEN xc ELSE 0 END) AS BIGINT) AS s_b
       |  FROM rows_),
       |obs2 AS (
       |  SELECT n_a, n_b,
       |    abs(${tSql("s_a", "n_a", "s_b", "n_b")}) AS t_obs_abs
       |  FROM obs),
       |perb AS (
       |  SELECT t.b,
       |    CAST(sum(CASE WHEN ($h) % (o.n_a + o.n_b) < o.n_a THEN 1 ELSE 0 END) AS BIGINT) AS pna,
       |    CAST(sum(CASE WHEN ($h) % (o.n_a + o.n_b) < o.n_a THEN xc ELSE 0 END) AS BIGINT) AS psa,
       |    CAST(sum(CASE WHEN ($h) % (o.n_a + o.n_b) < o.n_a THEN 0 ELSE 1 END) AS BIGINT) AS pnb,
       |    CAST(sum(CASE WHEN ($h) % (o.n_a + o.n_b) < o.n_a THEN 0 ELSE xc END) AS BIGINT) AS psb
       |  FROM rows_ CROSS JOIN range(0, $B) t(b) CROSS JOIN obs o
       |  GROUP BY 1),
       |tb AS (
       |  SELECT b, abs(${tSql("psa", "pna", "psb", "pnb")}) AS t_abs
       |  FROM perb WHERE pna > 0 AND pnb > 0)
       |SELECT o.n_a, o.n_b, round(o.t_obs_abs, 4) + 0.0 AS t_obs_abs,
       |  CAST(count(*) AS BIGINT) AS n_resamples,
       |  CAST(sum(CASE WHEN tb.t_abs >= o.t_obs_abs THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_extreme,
       |  round(CAST(1 + sum(CASE WHEN tb.t_abs >= o.t_obs_abs THEN 1 ELSE 0 END)
       |      AS DOUBLE) / CAST(1 + count(*) AS DOUBLE), 6) + 0.0 AS p_value
       |FROM tb CROSS JOIN obs2 o
       |GROUP BY 1, 2, 3""".stripMargin
  }
}
