package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Poisson-bootstrap confidence intervals per group — THE distributed
  * bootstrap (resampling-with-replacement is inherently sequential;
  * the Poisson approximation gives each row an independent
  * Poisson(1) multiplicity per resample, which is embarrassingly
  * parallel and what large-scale analytics stacks actually run). Per
  * group: the point mean plus a B-resample percentile CI — the
  * uncertainty q16/q31's point statistics can't report.
  *
  * Reproducibility (the q38 hash-threshold discipline lifted to
  * WEIGHTS): resample b's multiplicity for row key k is
  * F⁻¹_Poisson(1)(u) with u = hash48(k # b) ∈ [0, 2⁴⁸) — u compared
  * against PRECOMPUTED integer thresholds ⌊cdf_j·2⁴⁸⌋ (the same
  * literals embedded in the DuckDB twin), so the "random" weights are
  * a pure deterministic function of (key, b): re-runs, audits, and
  * the oracle reproduce the exact resamples bit-for-bit. Multiplicity
  * caps at [[MaxW]] (P(X ≥ 8) ≈ 1e-6 — truncation shared by both
  * engines).
  *
  * Exactness: per-resample sums are exact integer cents; each
  * resample mean is ONE shared-text division; the CI bounds are EXACT
  * ORDER STATISTICS over the ≤B resample means (lower ⌈q·B'⌉-th, the
  * q126 no-interpolation rule, B' = resamples with nonzero weight
  * mass) — no normal approximation, no interpolation.
  *
  * Plan/scale: one scan → checkpoint (point estimate + resamples
  * share it) → sequence-explode ×B (the bootstrap's intrinsic cost —
  * size B to your budget) → ONE map-side-combined (group, b)
  * aggregate → a (group)-partitioned rank window over ≤B rows
  * (bounded by the B PARAMETER, not the data) → final election.
  * Weights ride the codegen'd native hash48 — no RNG, no UDF.
  */
object Bootstrap {

  val DefaultB = 200
  val MaxW = 8

  /** ⌊cdf_Poisson(1)(j)·2⁴⁸⌋ for j = 0..MaxW−1 — driver-computed once,
    * embedded as literals in BOTH engines' expressions. */
  val Thresholds: Seq[Long] = {
    val eInv = math.exp(-1.0)
    var fact = 1.0
    var cum = 0.0
    (0 until MaxW).map { j =>
      if (j > 0) fact *= j
      cum += eInv / fact
      math.min((cum * 281474976710656.0).toLong, (1L << 48) - 1) // ·2⁴⁸
    }
  }

  /** The weight rule as plain JVM code — first 6 md5 bytes of "key#b"
    * (≡ hash48's first-12-hex-chars) against [[Thresholds]]. Used by
    * the 18s streaming twin's executor fold; equality with the
    * expression form is pinned transitively by BootstrapSpec's
    * driver brute-force parity. */
  def weightOf(key: String, b: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$key#$b".getBytes("UTF-8"))
    val u = ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) |
      ((h(2) & 0xffL) << 24) | ((h(3) & 0xffL) << 16) |
      ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
    Thresholds.count(u >= _)
  }

  /** All B weights of one key in one pass — identical semantics to
    * `(0 until b).map(weightOf(key, _))` (pinned by BootstrapSpec),
    * but ONE reused MessageDigest and one shared key-prefix byte
    * array instead of B digest instantiations + B full re-encodes:
    * the 18s streaming twin folds this per arriving row (r10 advice). */
  def weightsOf(key: String, b: Int): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val prefix = s"$key#".getBytes("UTF-8")
    val thr = Thresholds.toArray
    val out = new Array[Int](b)
    var i = 0
    while (i < b) {
      md.reset()
      md.update(prefix)
      md.update(String.valueOf(i).getBytes("UTF-8"))
      val h = md.digest()
      val u = ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) |
        ((h(2) & 0xffL) << 24) | ((h(3) & 0xffL) << 16) |
        ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
      var w = 0
      var j = 0
      while (j < thr.length) { if (u >= thr(j)) w += 1; j += 1 }
      out(i) = w
      i += 1
    }
    out
  }

  private def wSql(u: String): String =
    // bare literals: the thresholds (~1.6e14) exceed INT so both
    // engines parse them as BIGINT; an 'L' suffix is Spark-only syntax
    Thresholds.map(t => s"(CASE WHEN $u >= $t THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Scale-adaptive fan-out for the ×B resampling explodes (shared by
    * q144/q150/q257): the explode+hash+partial-aggregate is the
    * resampling family's dominant compute, and it inherits the INPUT's
    * partitioning — on a single-row-group parquet scan (the local
    * testdata shape; guide §2.5 "one huge unsplittable file") that is
    * ONE task doing all B·n digests. Round-robin repartition to the
    * session's parallelism when (and only when) the frame arrives with
    * fewer partitions, so an already-parallel corpus-scale input pays
    * nothing. Result-safe by construction: every downstream aggregate
    * here is a commutative integer/decimal sum keyed by (g, b), so row
    * placement cannot change a value (and keyless repartition's
    * sort-before-shuffle keeps the placement itself deterministic). */
  private[operators] def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Per-group percentile-bootstrap CI of the mean of `centsCol`
    * (exact integer cents), keyed by `keyCol`, at ±`tailPermille`/1000
    * tails (default 25 → a 95% CI). */
  def bootstrapCi(obs: DataFrame, groupCol: String, keyCol: String,
      centsCol: String, b: Int = DefaultB,
      tailPermille: Int = 25): DataFrame = {
    require(b >= 40 && tailPermille > 0 && tailPermille < 500)
    val base = obs
      .selectExpr(s"$groupCol AS g", s"$keyCol AS k", s"$centsCol AS xc")
      .filter("xc IS NOT NULL")
      .localCheckpoint(true) // point estimate + the B resamples share it
    val point = base.groupBy("g")
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_rows"),
        expr("CAST(sum(CAST(xc AS DECIMAL(38,0))) AS DECIMAL(38,0))")
          .as("sx"))
    val res = spread(base)
      .withColumn("b", explode(expr(s"sequence(0, ${b - 1})")))
      .withColumn("u", Hashing.hash48(
        concat(col("k").cast("string"), lit("#"), col("b").cast("string"))))
      .withColumn("w", expr(wSql("u")))
      .groupBy("g", "b")
      .agg(expr("CAST(sum(w) AS BIGINT)").as("sw"),
        expr("CAST(sum(CAST(w AS DECIMAL(38,0)) * xc) AS DECIMAL(38,0))")
          .as("swx"))
      .filter("sw > 0") // a zero-mass resample has no mean (P ≈ e^-n)
      .withColumn("m", expr("CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE)"))
    // rank window over ≤B rows per group: bounded by the B PARAMETER
    val wRank = Window.partitionBy("g").orderBy(col("m"), col("b"))
    val wAll = Window.partitionBy("g")
    res
      .withColumn("rn", row_number().over(wRank))
      .withColumn("bn", count(lit(1)).over(wAll))
      .groupBy("g")
      .agg(
        expr("CAST(max(bn) AS BIGINT)").as("n_resamples"),
        expr(s"min(CASE WHEN rn = CAST(($tailPermille * bn + 999) div 1000" +
          " AS BIGINT) THEN m END)").as("lo_m"),
        expr(s"min(CASE WHEN rn = CAST(((1000 - $tailPermille) * bn + 999)" +
          " div 1000 AS BIGINT) THEN m END)").as("hi_m"))
      .join(point, "g")
      .selectExpr("g", "n_rows", "n_resamples",
        "round(CAST(sx AS DOUBLE) / CAST(n_rows AS DOUBLE) / 1e2, 4) + 0.0" +
          " AS mean",
        "round(lo_m / 1e2, 4) + 0.0 AS ci_lo",
        "round(hi_m / 1e2, 4) + 0.0 AS ci_hi")
  }

  /** q144: 95% bootstrap CI on mean account balance per market
    * segment. */
  def segmentBalanceCi(spark: SparkSession, dir: String): DataFrame =
    bootstrapCi(
      Tables.customer(spark, dir)
        .filter(col("c_mktsegment").isNotNull && col("c_acctbal").isNotNull)
        .selectExpr("c_mktsegment", "c_custkey",
          "CAST(floor(c_acctbal * 1e2) AS BIGINT) AS bal_c"),
      "c_mktsegment", "c_custkey", "bal_c")
      .withColumnRenamed("g", "c_mktsegment")

  val segmentBalanceCiSql: String = {
    val u = Hashing.hash48Sql("(k)::VARCHAR || '#' || (b)::VARCHAR")
    s"""WITH base AS (
       |  SELECT c_mktsegment AS g, c_custkey AS k,
       |    CAST(floor(c_acctbal * 1e2) AS BIGINT) AS xc
       |  FROM customer
       |  WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL),
       |point AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(CAST(xc AS HUGEINT)) AS HUGEINT) AS sx
       |  FROM base GROUP BY 1),
       |weighted AS (
       |  SELECT g, b.b, xc, ${wSql(s"($u)")} AS w
       |  FROM base CROSS JOIN (SELECT unnest(range(0, $DefaultB)) AS b) b),
       |res AS (
       |  SELECT g, b, CAST(sum(w) AS BIGINT) AS sw,
       |    CAST(sum(CAST(w AS HUGEINT) * xc) AS HUGEINT) AS swx
       |  FROM weighted GROUP BY 1, 2),
       |means AS (
       |  SELECT g, b, CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) AS m
       |  FROM res WHERE sw > 0),
       |ranked AS (
       |  SELECT g, m,
       |    row_number() OVER (PARTITION BY g ORDER BY m, b) AS rn,
       |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS bn
       |  FROM means),
       |ci AS (
       |  SELECT g, CAST(max(bn) AS BIGINT) AS n_resamples,
       |    min(CASE WHEN rn = CAST((25 * bn + 999) // 1000 AS BIGINT)
       |      THEN m END) AS lo_m,
       |    min(CASE WHEN rn = CAST((975 * bn + 999) // 1000 AS BIGINT)
       |      THEN m END) AS hi_m
       |  FROM ranked GROUP BY 1)
       |SELECT ci.g AS c_mktsegment, n_rows, n_resamples,
       |  round(CAST(sx AS DOUBLE) / CAST(n_rows AS DOUBLE) / 1e2, 4) + 0.0
       |    AS mean,
       |  round(lo_m / 1e2, 4) + 0.0 AS ci_lo,
       |  round(hi_m / 1e2, 4) + 0.0 AS ci_hi
       |FROM ci JOIN point ON ci.g = point.g""".stripMargin
  }
}
