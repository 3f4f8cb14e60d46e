package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Deterministic stratified sampling — training-data curation's
  * "N% of each language / source / quality band" step, built to be
  * EXACTLY reproducible: membership is a pure function of the row key
  * (md5-derived hash threshold), never an RNG. Re-running the pipeline,
  * re-sampling after a re-crawl, or auditing a sample months later all
  * yield the identical row set — and the DuckDB oracle reproduces it
  * bit-for-bit, which `df.sample()`'s partition-seeded RNG cannot.
  *
  * Pure projection+filter: no shuffle at any scale; the per-stratum
  * fraction lookup is a literal CASE chain (strata counts are
  * dimension-grade).
  */
object Sampling {

  val Buckets = 1000000L

  /** Hash bucket in [0, Buckets) for a key column. */
  private[graft] def bucket(key: Column): Column =
    Hashing.hash48(key.cast("string")) % Buckets

  private[graft] def bucketSql(key: String): String =
    s"${Hashing.hash48Sql(s"($key)::VARCHAR")} % $Buckets"

  /** Integer bucket threshold for a fraction — computed ONCE on the
    * driver so both engines compare against the same exact literal.
    * Comparing against `fraction * Buckets` at query time would pit
    * Spark's double product against DuckDB's DECIMAL arithmetic, which
    * disagree on boundary buckets for fractions whose product rounds
    * (e.g. 0.00051 → 510.00000000000006 vs 510.00000). */
  private[graft] def thresholdFor(fraction: Double): Long =
    math.round(fraction * Buckets)

  /** Keep each row iff hash(key) falls under its stratum's fraction.
    * `fractions` maps stratum value → sampling fraction in [0, 1];
    * unlisted strata get `defaultFraction`. */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(lit(thresholdFor(defaultFraction))) {
      case (acc, (s, f)) => when(col(strataCol) === s, lit(thresholdFor(f))).otherwise(acc)
    }
    df.filter(bucket(col(keyCol)) < threshold)
  }

  // ---- q38: stratified customer sample by market segment ----

  val SegmentFractions: Seq[(String, Double)] = Seq(
    "AUTOMOBILE" -> 0.2, "BUILDING" -> 0.1, "FURNITURE" -> 0.05)
  val DefaultFraction = 0.02

  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    stratified(
      Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey")),
      "c_custkey", "c_mktsegment",
      SegmentFractions.toMap, DefaultFraction)

  // ---- q60: domain-mixture resampling to target proportions ----

  /** Target mixture over the `lang` domain as RATIONAL weights
    * (numerators over [[MixDen]]) — DoReMi-style domain reweighting
    * (Xie et al. 2023, arXiv:2305.10429) reduced to its deterministic
    * serving step: resample the corpus so domain d contributes ≈
    * weight_d of a target budget of N/2 documents. */
  val MixWeights: Seq[(String, Long)] = Seq(
    "en" -> 4L, "de" -> 2L, "es" -> 2L, "fr" -> 1L, "zh" -> 1L)
  val MixDen = 10L

  /** q60: per-domain acceptance-rate resampling, exactly reproducible.
    *
    * rate_d = min(1, budget·w_d / n_d) with budget = N div 2, evaluated
    * ENTIRELY in integer arithmetic — the bucket threshold is
    * `least(Buckets, (budget · num_d · Buckets) div (den · n_d))`, so
    * Spark and DuckDB compute the identical BIGINT and the oracle is
    * exact with no float-boundary risk (headroom: budget·num·Buckets ≲
    * 4e17 even at 1e11 docs). Membership is the same hash-threshold
    * rule as q38: a pure function of doc_id, stable across re-runs.
    *
    * Plan: ONE lang-only columnar count aggregate whose
    * dimension-grade result (k domain rows — the k-means-fit
    * precedent) is collected and turned into driver-computed integer
    * threshold literals, then ONE corpus scan with a projection-level
    * filter — no join, no broadcast, the corpus is never shuffled.
    * Driver Long arithmetic and DuckDB integer division follow the
    * identical expression tree, so the literals equal the oracle's
    * in-query values exactly. Domains whose quota exceeds their
    * population keep everything (the `least` cap); re-balancing their
    * shortfall is a policy choice left upstream. */
  /** The q60 acceptance filter over an ARBITRARY frame, keeping all
    * its columns — reused by the q142 pipeline, where the mix runs
    * over the curated (not raw) corpus. Same exactness contract as
    * [[domainMix]]. NOTE: the count aggregate and the filter both
    * read `df` — persist/checkpoint the input when it is derived
    * (Spark does not CSE repeated frames). */
  def mixFilter(df: DataFrame, keyCol: String, domainCol: String,
      weights: Map[String, Long], den: Long): DataFrame = {
    val counts = df.groupBy(domainCol).agg(count(lit(1)).as("n_s"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val budget = counts.map(_._2).sum / 2
    // ((budget·w)·B) / (den·n_s), left-assoc — mirrors the oracle's
    // `//` chain term for term; all-Long exact (≲4e17 at 1e11 docs)
    val thr = counts.foldLeft(lit(0L)) { case (acc, (l, nS)) =>
      val t = math.min(Buckets,
        budget * weights.getOrElse(l, 0L) * Buckets / (den * nS))
      when(col(domainCol) === l, lit(t)).otherwise(acc)
    }
    df.filter(bucket(col(keyCol)) < thr)
  }

  def domainMix(docs: DataFrame): DataFrame =
    mixFilter(docs.select(col("doc_id"), col("lang"), col("source")),
      "doc_id", "lang", MixWeights.toMap, MixDen)

  def domainMixSample(spark: SparkSession, dir: String): DataFrame =
    domainMix(Tables.documents(spark, dir))

  val domainMixSql: String = {
    val cases = MixWeights.map { case (l, w) => s"WHEN lang = '$l' THEN $w" }
      .mkString(" ")
    s"""WITH cnt AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_tot FROM cnt)
       |SELECT d.doc_id, d.lang, d.source
       |FROM documents d JOIN cnt USING (lang) CROSS JOIN tot
       |WHERE ${bucketSql("doc_id")} <
       |  least($Buckets, (((n_tot // 2) * (CASE $cases ELSE 0 END)) * $Buckets)
       |        // ($MixDen * n_s))""".stripMargin
  }

  // ---- q64: mixture resampling with shortfall redistribution ----

  /** q64's target mixture — deliberately over-weights the rarest domain
    * (zh) so its quota exceeds its population at every test SF and the
    * redistribution path is exercised, not just compiled. */
  val RebalanceWeights: Seq[(String, Long)] = Seq(
    "zh" -> 5L, "en" -> 2L, "de" -> 1L, "es" -> 1L, "fr" -> 1L)

  /** q64: [[domainMix]] plus the one-iteration shortfall redistribution
    * q60 leaves to upstream policy. Domains whose quota ≥ population
    * are EXHAUSTED: they keep everything, and their undeliverable
    * shortfall `Σ (quota_d − n_d)` is re-granted to the non-exhausted
    * domains proportionally to their ORIGINAL integer weights
    * (`add_d = short · w_d div Σ_non-exh w`). One iteration: a domain
    * pushed past its population by the re-grant just saturates at the
    * `least(Buckets, ·)` cap — the fixed-point iteration isn't worth a
    * second dimension pass.
    *
    * Same exactness contract as q60: every quantity is a driver-side
    * Long computed from ONE dimension-grade lang count (the identical
    * left-assoc `·, div` chain the oracle evaluates in-query), and
    * membership is the q38 hash-threshold rule — one corpus scan, no
    * join, no corpus shuffle, reproducible bit-for-bit. Headroom:
    * (quota+add)·Buckets ≤ n_tot·1e6 ≲ 1e17 at 1e11 docs. */
  def domainMixRebalanced(docs: DataFrame): DataFrame = {
    val weights = RebalanceWeights.toMap
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_s"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val budget = counts.map(_._2).sum / 2
    val quota = counts.map { case (l, nS) =>
      (l, nS, budget * weights.getOrElse(l, 0L) / MixDen)
    }
    val short = quota.collect { case (_, nS, q) if q >= nS => q - nS }.sum
    val wrem = quota.collect { case (l, nS, q) if q < nS =>
      weights.getOrElse(l, 0L) }.sum
    val thr = quota.foldLeft(lit(0L)) { case (acc, (l, nS, q)) =>
      val t =
        if (q >= nS) Buckets
        else {
          val add = if (wrem > 0) short * weights.getOrElse(l, 0L) / wrem else 0L
          math.min(Buckets, (q + add) * Buckets / nS)
        }
      when(col("lang") === l, lit(t)).otherwise(acc)
    }
    docs.select(col("doc_id"), col("lang"), col("source"))
      .filter(bucket(col("doc_id")) < thr)
  }

  def domainMixRebalance(spark: SparkSession, dir: String): DataFrame =
    domainMixRebalanced(Tables.documents(spark, dir))

  /** DuckDB twin: the identical integer expression tree, evaluated
    * in-query over the same lang counts. */
  val domainMixRebalanceSql: String = {
    val cases = RebalanceWeights.map { case (l, w) => s"WHEN lang = '$l' THEN $w" }
      .mkString(" ")
    s"""WITH cnt AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_s) AS BIGINT) // 2 AS budget FROM cnt),
       |q AS (SELECT lang, n_s,
       |    (budget * (CASE $cases ELSE 0 END)) // $MixDen AS quota,
       |    CAST(CASE $cases ELSE 0 END AS BIGINT) AS num
       |  FROM cnt CROSS JOIN tot),
       |agg AS (SELECT
       |    CAST(coalesce(sum(CASE WHEN quota >= n_s THEN quota - n_s END), 0)
       |         AS BIGINT) AS short,
       |    CAST(coalesce(sum(CASE WHEN quota < n_s THEN num END), 0)
       |         AS BIGINT) AS wrem
       |  FROM q),
       |thr AS (SELECT lang,
       |    CASE WHEN quota >= n_s THEN $Buckets
       |         ELSE least($Buckets,
       |           ((quota + CASE WHEN wrem > 0 THEN (short * num) // wrem
       |                          ELSE 0 END) * $Buckets) // n_s)
       |    END AS t
       |  FROM q CROSS JOIN agg)
       |SELECT d.doc_id, d.lang, d.source
       |FROM documents d JOIN thr USING (lang)
       |WHERE ${bucketSql("doc_id")} < t""".stripMargin
  }

  val stratifiedSampleSql: String = {
    // chain order differs from the when-chain's fold, which is fine
    // because strata values are distinct; thresholds are the SAME
    // driver-computed integer literals the Spark plan carries
    val cases = SegmentFractions.map { case (s, f) =>
      s"WHEN c_mktsegment = '$s' THEN ${thresholdFor(f)}"
    }.mkString(" ")
    s"""SELECT c_custkey, c_mktsegment, c_nationkey
       |FROM customer
       |WHERE ${bucketSql("c_custkey")} <
       |  (CASE $cases ELSE ${thresholdFor(DefaultFraction)} END)""".stripMargin
  }
}
