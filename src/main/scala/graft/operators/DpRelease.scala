package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Laplace-mechanism aggregate release — the third rung of the
  * privacy deck: q87 MEASURES re-identification risk (k-anonymity),
  * q92 pseudonymizes identifiers, and this one releases group
  * AGGREGATES with calibrated noise so the published table itself
  * stops leaking individual contributions. Per group: noisy count
  * (sensitivity 1) and noisy clamped sum (sensitivity = the clamp
  * bound C — values are clipped to [−C, C] FIRST, which is what makes
  * the sum's sensitivity a constant the noise can calibrate to;
  * unclamped sums have unbounded sensitivity and no finite ε works).
  *
  * DETERMINISM CAVEAT (documented, not hidden): real ε-DP requires
  * fresh randomness per release; this operator draws the Laplace
  * noise from the engine's seeded hash48 of (release tag, group) —
  * the exact inverse-CDF transform, bit-reproducible in both engines.
  * That makes releases AUDITABLE and idempotent (re-running a
  * pipeline cannot burn privacy budget twice on identical noise), at
  * the cost that the formal guarantee holds per (seed, tag) — rotate
  * the tag per release period, exactly like the q92 token epoch. The
  * noise DISTRIBUTION is the textbook mechanism: u uniform on (0,1)
  * from the 48-bit hash, X = −b·sgn(u−½)·ln(1−2|u−½|), b = sens/ε.
  *
  * Exactness: u is an exact rational (h + ½)/2⁴⁸; the one ln is
  * 1e-9-snapped (the lnSnap rule); every other op is a shared-text
  * single multiply/divide; true aggregates are exact integer cents
  * and are NOT emitted (release hygiene — only noisy values leave).
  *
  * Plan/scale: ONE map-side-combined aggregate to group grade; noise
  * is a projection on the group-grade frame. */
object DpRelease {

  /** Per-release privacy budget (each statistic's own ε; the release
    * of (count, sum) composes to 2ε — documented at the API). */
  val Epsilon = 0.5
  /** Clamp bound for the summed value (dollars): |acctbal| < 10⁴ is
    * a true domain bound here, so clamping is a no-op on clean data
    * while keeping the DP sensitivity a constant on ANY data. */
  val Clamp = 10000.0

  private def lnSnap(x: String): String =
    s"CAST(floor(ln($x) * 1e9 + 5e-1) AS DOUBLE) / 1e9"

  /** Laplace draw (shared text modulo the hash SPELLING — Spark uses
    * the native hash48, DuckDB the portable recipe; both produce the
    * identical 48-bit value): u uniform from the hash, scale b. */
  private def lapSqlWith(hashExpr: String, b: String): String = {
    val u = s"((CAST($hashExpr AS DOUBLE) + 0.5) / 281474976710656.0)"
    s"(-($b) * (CASE WHEN $u >= 0.5 THEN 1.0 ELSE -1.0 END)" +
      s" * ${lnSnap(s"1.0 - 2.0 * abs($u - 0.5)")})"
  }
  private def lapSparkSql(tag: String, gCol: String, b: String): String =
    lapSqlWith(s"hash48(concat('$tag:', $gCol))", b)
  private def lapDuckSql(tag: String, gCol: String, b: String): String =
    lapSqlWith(Hashing.hash48Sql(s"concat('$tag:', $gCol)"), b)

  /** Noisy (count, clamped sum) release over rows (g, v). */
  def release(rows: DataFrame, tag: String): DataFrame =
    rows
      .selectExpr("g",
        s"CAST(floor(greatest(least(v, $Clamp), -$Clamp) * 100)" +
          " AS BIGINT) AS vc")
      .groupBy("g")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_true"),
        expr("CAST(sum(vc) AS BIGINT)").as("s_true"))
      .selectExpr("g",
        s"round(CAST(n_true AS DOUBLE)" +
          s" + ${lapSparkSql(s"$tag:n", "g", s"1.0 / $Epsilon")}, 4)" +
          " + 0.0 AS count_noisy",
        s"round(CAST(s_true AS DOUBLE) / 100.0" +
          s" + ${lapSparkSql(s"$tag:s", "g", s"$Clamp / $Epsilon")}, 4)" +
          " + 0.0 AS sum_noisy",
        s"CAST($Epsilon AS DOUBLE) AS epsilon",
        s"CAST($Clamp AS DOUBLE) AS clamp")

  /** q243: noisy per-segment customer count and clamped balance sum
    * (release tag pins the epoch — rotate per publication). */
  val Tag = "r14"
  def segmentBalanceRelease(spark: SparkSession, dir: String): DataFrame =
    release(Tables.customer(spark, dir)
      .selectExpr("c_mktsegment AS g", "CAST(c_acctbal AS DOUBLE) AS v"), Tag)
      .withColumnRenamed("g", "c_mktsegment")

  /** DuckDB twin: identical clamp, hash-uniform, snapped inverse CDF. */
  val segmentBalanceReleaseSql: String =
    s"""WITH agg AS (
       |  SELECT c_mktsegment AS g, CAST(count(*) AS BIGINT) AS n_true,
       |    CAST(sum(CAST(floor(greatest(least(CAST(c_acctbal AS DOUBLE),
       |      $Clamp), -$Clamp) * 100) AS BIGINT)) AS BIGINT) AS s_true
       |  FROM customer GROUP BY 1)
       |SELECT g AS c_mktsegment,
       |  round(CAST(n_true AS DOUBLE)
       |    + ${lapDuckSql(s"$Tag:n", "g", s"1.0 / $Epsilon")}, 4)
       |    + 0.0 AS count_noisy,
       |  round(CAST(s_true AS DOUBLE) / 100.0
       |    + ${lapDuckSql(s"$Tag:s", "g", s"$Clamp / $Epsilon")}, 4)
       |    + 0.0 AS sum_noisy,
       |  CAST($Epsilon AS DOUBLE) AS epsilon,
       |  CAST($Clamp AS DOUBLE) AS clamp
       |FROM agg""".stripMargin
}
