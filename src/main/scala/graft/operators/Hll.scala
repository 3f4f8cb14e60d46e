package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
  * sketch that makes COUNT(DISTINCT) survive 100 TB. Exact distinct
  * shuffles every key to its reducer; the HLL register table is a
  * fixed [[M]]·|groups| rows REGARDLESS of cardinality, the register
  * aggregate (max per bucket) is algebraic — map-side combined, so a
  * 1000-executor scan ships 256 small integers per group per task —
  * and partial sketches MERGE by pointwise max ([[merged]]), which is
  * what lets per-partition / per-day sketches roll up without ever
  * re-touching the fact rows.
  *
  * EXACTNESS (the oracle-parity design): the whole register program
  * is integer/string arithmetic — hash48 → bucket = top 8 bits,
  * w = low 40 bits, ρ = 41 − length(bin(w)) (bin() renders without
  * leading zeros in BOTH engines; w = 0 → ρ = 41) — and the harmonic
  * denominator Σ 2^(−ρ_max) is cleared to the exact BIGINT
  * S = Σ 2^(41−ρ_max) (empty buckets contribute 2^41; max S = 2^49,
  * no overflow). The raw estimate α·m²·2⁴¹/S is then ONE shared-text
  * double chain off identical literals, and the small-range
  * linear-counting branch (raw ≤ 2.5m and empty buckets exist:
  * E = m·ln(m/V)) snaps its single ln to the 1e-9 grid (house rule).
  * The HLL++ large-range correction is NOT needed: a 48-bit hash has
  * no collision regime below ~10¹² distinct; at true 100 TB key
  * spaces swap [[Hashing.hash48]] for a 64-bit splitmix and widen W
  * — the program text is otherwise unchanged (documented knob).
  *
  * Standard error ≈ 1.04/√m = 6.5% at m = 256; raise [[M]] for
  * tighter bands (the register table stays dimension-grade).
  *
  * The registered query q245 carries the EXACT distinct beside the
  * sketch — the audit pattern (q234/q235/q241): at test scale the
  * truth is affordable and the relative error is the deliverable;
  * production reads the sketch alone. */
object Hll {

  /** Register count m (2^8 buckets from the hash's top byte). */
  val M = 256
  /** 2^40 — splits the 48-bit hash into (bucket, 40-bit suffix). */
  val W2 = 1099511627776L
  /** 2^41 — the cleared-denominator unit: 2^(41−ρ), ρ ∈ [0, 41]. */
  val Unit2 = 2199023255552L
  /** α_m·m²·2⁴¹ numerator, PINNED as one exponent-notation literal
    * (exponent form is a DOUBLE literal in both engines; a
    * decimal-point spelling would be DECIMAL in DuckDB and fold the
    * α chain differently — the ulp split showed up at a round-4
    * boundary in testing). Derivation, IEEE double ops left to
    * right: 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 *
    * 2199023255552.0 (α per the standard m ≥ 128 formula
    * α = 0.7213/(1 + 1.079/m)). */
  val NumSql = "1.0351398986589102e17"

  private def lnSnap(x: String): String =
    s"CAST(floor(ln($x) * 1e9 + 5e-1) AS DOUBLE) / 1e9"

  /** Register table (g, b, r) from rows (g, k): max ρ per bucket.
    * ONE map-side-combined aggregate; ≤ [[M]] rows per group. */
  def registers(rows: DataFrame): DataFrame =
    rows
      .select(col("g"), Hashing.hash48(col("k")).as("h"))
      .selectExpr("g", s"h div $W2 AS b", s"h % $W2 AS w")
      .selectExpr("g", "b",
        "CASE WHEN w = 0 THEN 41 ELSE 41 - length(bin(w)) END AS rho")
      .groupBy("g", "b")
      .agg(expr("CAST(max(rho) AS BIGINT)").as("r"))

  /** Pointwise-max merge of two register tables — the distributed
    * roll-up primitive (sketch(A ∪ B) ≡ merged(sketch(A), sketch(B)),
    * spec-pinned). */
  def merged(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("g", "b")
      .agg(expr("CAST(max(r) AS BIGINT)").as("r"))

  /** Estimate frame (g, v_zero, s, hll_est) from a register table:
    * v_zero = empty buckets, s = exact cleared denominator, hll_est
    * the bias-corrected estimate (unrounded — callers round). */
  def estimate(regs: DataFrame): DataFrame =
    regs.groupBy("g")
      .agg(expr("CAST(count(1) AS BIGINT)").as("nb"),
        expr("CAST(sum(shiftleft(CAST(1 AS BIGINT), " +
          "CAST(41 - r AS INT))) AS BIGINT)").as("s_obs"))
      .selectExpr("g", s"CAST($M - nb AS BIGINT) AS v_zero",
        s"s_obs + ($M - nb) * $Unit2 AS s")
      .selectExpr("g", "v_zero", "s",
        s"$NumSql / CAST(s AS DOUBLE) AS raw")
      .selectExpr("g", "v_zero", "s",
        s"CASE WHEN raw <= 640.0 AND v_zero > 0 THEN" +
          s" 256.0 * ${lnSnap("256.0 / CAST(v_zero AS DOUBLE)")}" +
          " ELSE raw END AS hll_est")

  /** rows (g, k string) → (g, v_zero, s, hll_est). */
  def sketch(rows: DataFrame): DataFrame = estimate(registers(rows))

  /** q245: HLL distinct order keys per return flag on lineitem,
    * audited against the exact distinct — the rel_err column IS the
    * deliverable (|rel_err| ≲ 2/√m at these cardinalities). */
  def orderkeyHll(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag AS g", "CAST(l_orderkey AS STRING) AS k")
      .localCheckpoint(true) // two consumers: sketch + exact audit
    val exact = li.groupBy("g")
      .agg(expr("CAST(count(DISTINCT k) AS BIGINT)").as("n_exact"))
    sketch(li).join(exact, "g")
      .selectExpr("g AS l_returnflag", "n_exact",
        "round(hll_est, 4) + 0.0 AS hll_estimate",
        "round((hll_est - n_exact) / n_exact, 6) + 0.0 AS rel_err")
  }

  /** DuckDB twin of [[orderkeyHll]]: identical integer register
    * program (hash spelling per the portable recipe, `//`/`<<` for
    * `div`/`shiftleft`), identical shared-text estimate. */
  val orderkeyHllSql: String =
    s"""WITH keyed AS (
       |  SELECT l_returnflag AS g,
       |    ${Hashing.hash48Sql("CAST(l_orderkey AS VARCHAR)")} AS h
       |  FROM lineitem),
       |rhos AS (
       |  SELECT g, h // $W2 AS b,
       |    CASE WHEN h % $W2 = 0 THEN 41
       |      ELSE 41 - length(bin(h % $W2)) END AS rho
       |  FROM keyed),
       |regs AS (
       |  SELECT g, b, CAST(max(rho) AS BIGINT) AS r
       |  FROM rhos GROUP BY 1, 2),
       |agg AS (
       |  SELECT g, CAST($M - count(*) AS BIGINT) AS v_zero,
       |    CAST(sum(1::BIGINT << CAST(41 - r AS INT)) AS BIGINT)
       |      + ($M - count(*)) * $Unit2 AS s
       |  FROM regs GROUP BY 1),
       |est AS (
       |  SELECT g, v_zero, $NumSql / CAST(s AS DOUBLE) AS raw
       |  FROM agg),
       |fin AS (
       |  SELECT g,
       |    CASE WHEN raw <= 640.0 AND v_zero > 0 THEN
       |      256.0 * ${lnSnap("256.0 / CAST(v_zero AS DOUBLE)")}
       |    ELSE raw END AS hll_est
       |  FROM est),
       |ex AS (
       |  SELECT l_returnflag AS g,
       |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact
       |  FROM lineitem GROUP BY 1)
       |SELECT ex.g AS l_returnflag, n_exact,
       |  round(hll_est, 4) + 0.0 AS hll_estimate,
       |  round((hll_est - n_exact) / n_exact, 6) + 0.0 AS rel_err
       |FROM fin JOIN ex ON fin.g = ex.g""".stripMargin

  // ---- q262: sketch SET ALGEBRA (union merge + inclusion–exclusion) ----

  /** q262: distinct-key OVERLAP between groups from sketches alone —
    * the audience-overlap question ("how many orders appear under
    * both return flags") that exact set intersection answers with a
    * full shuffle of both key sets, and HLL answers from three
    * register tables: |A∩B| ≈ E(A) + E(B) − E(A∪B), where the UNION
    * sketch is the pointwise register max ([[merged]]'s primitive —
    * this row is WHY sketches must merge). The audit carries the
    * exact overlap beside it (q241/q245 doctrine) because
    * inclusion–exclusion AMPLIFIES sketch error — the difference of
    * three ±1.04/√m estimates can be far off a SMALL true overlap
    * (relative to overlap size), while staying tight relative to the
    * UNIVERSE the sketches actually measure; rel_err_union reports
    * the honest denominator beside the headline one. */
  def flagOverlapHll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag AS g", "CAST(l_orderkey AS STRING) AS k")
      .localCheckpoint(true) // consumers: registers + exact overlap
    val regs = registers(li).localCheckpoint(true) // single + union ests
    val flags = li.select("g").distinct().collect()
      .map(_.getString(0)).sorted.toSeq
    val pairs = for (a <- flags; b <- flags if a < b) yield (a, b)
    val members = pairs
      .flatMap { case (a, b) => Seq((s"$a|$b", a), (s"$a|$b", b)) }
      .toDF("pair", "g")
    val singles = estimate(regs).select(col("g"), col("hll_est"))
    val unions = estimate(
      regs.join(broadcast(members), "g")
        .groupBy(col("pair").as("g"), col("b"))
        .agg(expr("CAST(max(r) AS BIGINT)").as("r")))
      .select(col("g").as("pair"), col("hll_est").as("est_union"))
    val dk = li.distinct()
    val exact = dk.as("a").join(dk.as("b"),
        col("a.k") === col("b.k") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("flag_a"), col("b.g").as("flag_b"))
      .agg(expr("CAST(count(1) AS BIGINT)").as("n_exact_overlap"))
    pairs.toDF("flag_a", "flag_b")
      .join(singles.select(col("g").as("flag_a"), col("hll_est").as("ea")), "flag_a")
      .join(singles.select(col("g").as("flag_b"), col("hll_est").as("eb")), "flag_b")
      .withColumn("pair", concat(col("flag_a"), lit("|"), col("flag_b")))
      .join(unions, "pair")
      .join(exact, Seq("flag_a", "flag_b"))
      .selectExpr("flag_a", "flag_b", "n_exact_overlap",
        "round(ea + eb - est_union, 4) + 0.0 AS overlap_est",
        "round((ea + eb - est_union - n_exact_overlap)" +
          " / CAST(n_exact_overlap AS DOUBLE), 6) + 0.0 AS rel_err",
        "round((ea + eb - est_union - n_exact_overlap)" +
          " / est_union, 6) + 0.0 AS rel_err_union")
  }

  /** DuckDB twin: the q245 register program, the literal pair↔member
    * table, pointwise-max union registers, the shared estimate text
    * on singles and unions, inclusion–exclusion, and the exact
    * distinct-pair overlap join. */
  val flagOverlapHllSql: String = {
    val estText =
      s"""SELECT g, CASE WHEN raw <= 640.0 AND v_zero > 0 THEN
         |    256.0 * ${lnSnap("256.0 / CAST(v_zero AS DOUBLE)")}
         |  ELSE raw END AS hll_est
         |FROM (SELECT g, v_zero, $NumSql / CAST(s AS DOUBLE) AS raw
         |      FROM %s)""".stripMargin.replace("\n", " ")
    s"""WITH keyed AS (
       |  SELECT DISTINCT l_returnflag AS g, CAST(l_orderkey AS VARCHAR) AS k
       |  FROM lineitem),
       |hashed AS (
       |  SELECT g, ${Hashing.hash48Sql("k")} AS h FROM keyed),
       |regs AS (
       |  SELECT g, h // $W2 AS b,
       |    CAST(max(CASE WHEN h % $W2 = 0 THEN 41
       |      ELSE 41 - length(bin(h % $W2)) END) AS BIGINT) AS r
       |  FROM hashed GROUP BY 1, 2),
       |flags AS (SELECT DISTINCT g FROM regs),
       |pairs AS (
       |  SELECT a.g AS flag_a, b.g AS flag_b, a.g || '|' || b.g AS pair
       |  FROM flags a JOIN flags b ON a.g < b.g),
       |members AS (
       |  SELECT pair, flag_a AS g FROM pairs
       |  UNION ALL SELECT pair, flag_b AS g FROM pairs),
       |uregs AS (
       |  SELECT m.pair AS g, r2.b, CAST(max(r2.r) AS BIGINT) AS r
       |  FROM regs r2 JOIN members m ON m.g = r2.g
       |  GROUP BY 1, 2),
       |sagg AS (
       |  SELECT g, CAST($M - count(*) AS BIGINT) AS v_zero,
       |    CAST(sum(1::BIGINT << CAST(41 - r AS INT)) AS BIGINT)
       |      + ($M - count(*)) * $Unit2 AS s
       |  FROM regs GROUP BY 1),
       |uagg AS (
       |  SELECT g, CAST($M - count(*) AS BIGINT) AS v_zero,
       |    CAST(sum(1::BIGINT << CAST(41 - r AS INT)) AS BIGINT)
       |      + ($M - count(*)) * $Unit2 AS s
       |  FROM uregs GROUP BY 1),
       |sest AS (${estText.format("sagg")}),
       |uest AS (${estText.format("uagg")}),
       |exact AS (
       |  SELECT a.g AS flag_a, b.g AS flag_b,
       |    CAST(count(*) AS BIGINT) AS n_exact_overlap
       |  FROM keyed a JOIN keyed b ON a.k = b.k AND a.g < b.g
       |  GROUP BY 1, 2)
       |SELECT p.flag_a, p.flag_b, x.n_exact_overlap,
       |  round(sa.hll_est + sb.hll_est - u.hll_est, 4) + 0.0 AS overlap_est,
       |  round((sa.hll_est + sb.hll_est - u.hll_est - x.n_exact_overlap)
       |    / CAST(x.n_exact_overlap AS DOUBLE), 6) + 0.0 AS rel_err,
       |  round((sa.hll_est + sb.hll_est - u.hll_est - x.n_exact_overlap)
       |    / u.hll_est, 6) + 0.0 AS rel_err_union
       |FROM pairs p
       |JOIN sest sa ON sa.g = p.flag_a
       |JOIN sest sb ON sb.g = p.flag_b
       |JOIN uest u ON u.g = p.pair
       |JOIN exact x ON x.flag_a = p.flag_a AND x.flag_b = p.flag_b""".stripMargin
  }

  // ---- q261: drift monitoring ON a sketch series (sketch → monitor) ----

  /** q261: Page–Hinkley drift evidence over MONTHLY HLL sketches of
    * distinct shipped orders per return flag — the composed
    * sketch→monitor pipeline (r14 verdict #8): at 100 TB you cannot
    * afford exact per-window distincts just to feed a drift monitor;
    * the production shape is register sketches per time bucket
    * (map-side-combined, [[M]]·buckets rows total, rolling up by
    * pointwise max) with the monitor reading the ESTIMATE series.
    * Month grain per the q143 time-bucket-first doctrine; estimates
    * enter the exact-integer PH walk as micro-unit BIGINTs
    * (floor(est·1e6 + 0.5) — both engines round the SAME shared-text
    * double, so the series is integer-identical and the walk exact).
    * PH values are therefore in micro-distincts (the /n division at
    * the end keeps the usual normalization). */
  def shipMonthHllDrift(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate").isNotNull)
      .selectExpr(
        "concat(l_returnflag, ':', CAST(year(CAST(l_shipdate AS DATE)) * 12" +
          " + month(CAST(l_shipdate AS DATE)) - 1 AS STRING)) AS g",
        "CAST(l_orderkey AS STRING) AS k")
    val series = sketch(keyed).selectExpr(
      "split(g, ':')[0] AS g",
      "CAST(split(g, ':')[1] AS BIGINT) AS t",
      "CAST(floor(hll_est * 1e6 + 5e-1) AS BIGINT) AS x")
    PageHinkley.pageHinkley(series)
      .withColumnRenamed("g", "l_returnflag")
      .withColumnRenamed("up_day", "up_month")
      .withColumnRenamed("down_day", "down_month")
  }

  /** DuckDB twin: the identical register program keyed by
    * (flag, month), the identical estimate text, the micro-unit
    * clearing, then [[PageHinkley.phWalkSql]]'s walk verbatim. */
  val shipMonthHllDriftSql: String =
    s"""WITH keyed AS (
       |  SELECT l_returnflag AS rf,
       |    CAST(year(CAST(l_shipdate AS DATE)) * 12
       |      + month(CAST(l_shipdate AS DATE)) - 1 AS BIGINT) AS t,
       |    ${Hashing.hash48Sql("CAST(l_orderkey AS VARCHAR)")} AS h
       |  FROM lineitem WHERE l_shipdate IS NOT NULL),
       |rhos AS (
       |  SELECT rf, t, h // $W2 AS b,
       |    CASE WHEN h % $W2 = 0 THEN 41
       |      ELSE 41 - length(bin(h % $W2)) END AS rho
       |  FROM keyed),
       |regs AS (
       |  SELECT rf, t, b, CAST(max(rho) AS BIGINT) AS r
       |  FROM rhos GROUP BY 1, 2, 3),
       |agg AS (
       |  SELECT rf, t, CAST($M - count(*) AS BIGINT) AS v_zero,
       |    CAST(sum(1::BIGINT << CAST(41 - r AS INT)) AS BIGINT)
       |      + ($M - count(*)) * $Unit2 AS s
       |  FROM regs GROUP BY 1, 2),
       |est0 AS (
       |  SELECT rf, t, v_zero, $NumSql / CAST(s AS DOUBLE) AS raw
       |  FROM agg),
       |series AS (
       |  SELECT rf AS g, t,
       |    CAST(floor((CASE WHEN raw <= 640.0 AND v_zero > 0 THEN
       |        256.0 * ${lnSnap("256.0 / CAST(v_zero AS DOUBLE)")}
       |      ELSE raw END) * 1e6 + 5e-1) AS BIGINT) AS x
       |  FROM est0),
       |${PageHinkley.phWalkSql("series", "l_returnflag", "up_month", "down_month")}""".stripMargin
}
