package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Cox proportional-hazards regression (single covariate, Breslow
  * ties) — the EFFECT-SIZE rung of the survival deck: q110/q178 draw
  * the curves, q159/q161 answer "different?", q186 scores ranking —
  * Cox answers "by HOW MUCH does one unit of x multiply the hazard?"
  * with censoring handled correctly, the number (a hazard ratio with
  * a CI-able SE) that a churn model or a retention report actually
  * quotes. Score/information at β come from the classic risk-set
  * sums S_k(t) = Σ_{dur ≥ t} x^k·e^{βx}:
  *
  *   U(β) = Σ_events (x_i − S₁/S₀),  I(β) = Σ_t d_t·(S₂/S₀ − (S₁/S₀)²)
  *   β ← β + U/I   ([[Iters]] fixed Newton steps from β = 0 — the
  *   first step's U/I is the LOG-RANK score pair, the q159 bridge)
  *
  * Exactness: the corpus collapses to (g, dur, x) CELLS once; each
  * iteration re-reads only that checkpointed dimension-grade frame.
  * e^{βx} is snapped to an integer NANO grid per CELL (one libm call
  * per distinct (dur, x), the q110 ln discipline) with the exponent
  * clamped to ±[[ExpClamp]] nats (beyond that the fit has diverged —
  * a monotone-likelihood arm — and the clamp only stops the integer
  * grid from overflowing, it never touches a sane fit); all risk-set
  * sums are exact DECIMAL(38,0) and the per-event-time U/I terms are
  * re-snapped to nano before summing (order-free integer sums, never
  * a double across rows). The β update chain is shared SQL text, so
  * both engines run the identical integer program through all
  * iterations.
  *
  * Plan/scale: ONE corpus-touch cell aggregate → per iteration: a
  * broadcast join of the |g|-row coefficient frame + one keyed spine
  * aggregate + a duration-spine suffix window (bounded by the
  * observation span in days — the q110/q159 calendar-cell class,
  * never subject count) + one keyed finish, each iteration
  * materialized shallow (the q147/q164 lazy-lineage lesson). */
object CoxPh {

  /** Fixed Newton steps (determinism over adaptivity, the q94/q164
    * stance; quadratic convergence makes 6 ≫ round-6 display). */
  val Iters = 6

  /** |βx| clamp in nats before the nano-grid exp — e^18·1e9 ≈ 6.6e16
    * keeps every DECIMAL(38,0) product far from overflow while being
    * unreachable by any non-divergent fit at grid-scale covariates. */
  val ExpClamp = "18e0"

  /** Nano-snapped, clamped e^{βx} as an INTEGER (shared text; b
    * DOUBLE, x BIGINT). */
  private val E9Sql =
    s"CAST(floor(exp(least(greatest(b * CAST(x AS DOUBLE), -$ExpClamp)," +
      s" $ExpClamp)) * 1e9 + 5e-1) AS DECIMAL(38,0))"

  /** Per-event-time score / information terms from the inclusive
    * suffix sums (doubles recovered from nano ints; shared text). */
  private val R1Sql = "(CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE))"
  private val UtSql =
    s"CAST(floor((CAST(sx AS DOUBLE) - CAST(d AS DOUBLE) * $R1Sql)" +
      " * 1e9 + 5e-1) AS DECIMAL(38,0))"
  private val ItSql =
    "CAST(floor(CAST(d AS DOUBLE) * (CAST(s2 AS DOUBLE)" +
      s" / CAST(s0 AS DOUBLE) - $R1Sql * $R1Sql)" +
      " * 1e9 + 5e-1) AS DECIMAL(38,0))"

  /** Newton update (shared text): NULL-propagating when the
    * information is non-positive (degenerate group). */
  private val BNextSql =
    "CASE WHEN si > 0 THEN b + CAST(su AS DOUBLE) / CAST(si AS DOUBLE)" +
      " END"

  /** Two-sided normal p via A&S 7.1.26 (the q94/q100/q159 chain). */
  private def pSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val u = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u" +
      s" - 0.284496736) * $u + 0.254829592) * $u * exp(-($x * $x)))"
  }

  /** Cox fit per group over an observation frame with (seg, dur,
    * event, x): integer duration, 0/1 event, integer-grid covariate.
    * One row per group: (seg, n_subjects, n_events, beta, se_beta,
    * z_cox, hazard_ratio, p_value) — NULLs when the group is
    * informationless (no events, or x constant at every event). */
  def coxPhBy(obs: DataFrame, seg: String, iters: Int = Iters): DataFrame = {
    val cells = obs.groupBy(seg, "dur", "x").agg(
      expr("CAST(count(1) AS BIGINT)").as("a"),
      expr("CAST(sum(event) AS BIGINT)").as("e"))
      .localCheckpoint(true) // iters+1 aggregate passes re-read it
    val totals = cells.groupBy(seg).agg(
      expr("CAST(sum(a) AS BIGINT)").as("n_subjects"),
      expr("CAST(sum(e) AS BIGINT)").as("n_events"))
    val wSuffix = Window.partitionBy(seg).orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    /** One Newton pass: cells ⋈ broadcast β → nano risk weights →
      * per-dur spine sums → suffix risk sets → snapped U/I terms →
      * keyed update. Materialized so iterations stay shallow jobs. */
    def step(beta: DataFrame): DataFrame = {
      val spine = cells
        .join(broadcast(beta.select(col(seg), col("b"))), Seq(seg))
        .selectExpr(seg, "dur", "b",
          "CAST(e AS BIGINT) AS e", "CAST(e * x AS BIGINT) AS exx",
          s"CAST(a AS DECIMAL(38,0)) * $E9Sql AS w0",
          s"CAST(a AS DECIMAL(38,0)) * x * $E9Sql AS w1",
          s"CAST(a AS DECIMAL(38,0)) * x * x * $E9Sql AS w2")
        .groupBy(seg, "dur").agg(
          first("b").as("b"),
          expr("CAST(sum(e) AS BIGINT)").as("d"),
          expr("CAST(sum(exx) AS BIGINT)").as("sx"),
          expr("CAST(sum(w0) AS DECIMAL(38,0))").as("v0"),
          expr("CAST(sum(w1) AS DECIMAL(38,0))").as("v1"),
          expr("CAST(sum(w2) AS DECIMAL(38,0))").as("v2"))
      spine
        .withColumn("s0", sum("v0").over(wSuffix))
        .withColumn("s1", sum("v1").over(wSuffix))
        .withColumn("s2", sum("v2").over(wSuffix))
        .filter(col("d") > 0)
        .selectExpr(seg, "b", "d",
          s"$UtSql AS ut", s"$ItSql AS it")
        .groupBy(seg).agg(
          first("b").as("b0"),
          expr("CAST(sum(ut) AS DECIMAL(38,0))").as("su"),
          expr("CAST(sum(it) AS DECIMAL(38,0))").as("si"))
        .selectExpr(seg, "CAST(su AS DOUBLE) / 1e9 AS su",
          "CAST(si AS DOUBLE) / 1e9 AS si", "b0 AS b")
        .selectExpr(seg, s"$BNextSql AS b", "si")
        .localCheckpoint(true)
    }

    var beta = totals.select(col(seg), expr("CAST(0e0 AS DOUBLE)").as("b"),
      expr("CAST(NULL AS DOUBLE)").as("si")).localCheckpoint(true)
    for (_ <- 0 until iters) beta = step(beta)
    // LEFT from totals: a group with zero events has no step rows and
    // falls out of the Newton frame — it still owes a NULL output row
    totals.join(broadcast(beta), Seq(seg), "left")
      .selectExpr(seg, "n_subjects", "n_events",
        "round(b, 6) + 0.0 AS beta",
        "round(1.0 / sqrt(nullif(si, 0.0)), 6) + 0.0 AS se_beta",
        "round(b * sqrt(nullif(si, 0.0)), 4) + 0.0 AS z_cox",
        "round(CAST(floor(exp(least(greatest(b, -18e0), 18e0)) * 1e9" +
          " + 5e-1) AS DOUBLE) / 1e9, 6) + 0.0 AS hazard_ratio")
      .selectExpr(seg, "n_subjects", "n_events", "beta", "se_beta",
        "z_cox", "hazard_ratio",
        s"round(${pSql("z_cox")}, 6) + 0.0 AS p_value")
  }

  /** q200: by how much does each hundred dollars of MISSING account
    * balance multiply a customer's churn hazard, per segment — the
    * q186 ranking question asked as an effect size, on the q110/q159
    * observation frame (first→last-order duration, 90-day censor
    * anchor; x = −⌊balance/100⌋, so positive β = poorer accounts
    * churn faster). */
  def segmentBalanceCox(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_custkey"),
        expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')").as("d"))
      .groupBy("o_custkey")
      .agg(min("d").as("first_d"), max("d").as("last_d"))
      .localCheckpoint(true) // censor anchor + obs both read it
    val mx = perCust.agg(max("last_d").as("mx"))
    val obs = perCust
      .crossJoin(broadcast(mx))
      .join(broadcast(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment", "c_acctbal")),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_mktsegment AS g",
        "CAST(last_d - first_d AS BIGINT) AS dur",
        "CASE WHEN last_d < mx - 90 THEN 1 ELSE 0 END AS event",
        "-CAST(floor(c_acctbal / 100.0) AS BIGINT) AS x")
    coxPhBy(obs, "g").withColumnRenamed("g", "c_mktsegment")
  }

  /** DuckDB twin: the identical unrolled Newton cascade (cells →
    * per-iteration nano weights, spine, suffix window, snapped U/I,
    * update) with DECIMAL(38,0) as HUGEINT. */
  val segmentBalanceCoxSql: String = {
    val e9 = E9Sql.replace("DECIMAL(38,0)", "HUGEINT")
    val ut = UtSql.replace("DECIMAL(38,0)", "HUGEINT")
    val it = ItSql.replace("DECIMAL(38,0)", "HUGEINT")
    val iterCtes = (1 to Iters).map { k =>
      s"""sp$k AS (
         |  SELECT g, dur, first(b) AS b,
         |    CAST(sum(e) AS BIGINT) AS d, CAST(sum(e * x) AS BIGINT) AS sx,
         |    CAST(sum(CAST(a AS HUGEINT) * $e9) AS HUGEINT) AS v0,
         |    CAST(sum(CAST(a AS HUGEINT) * x * $e9) AS HUGEINT) AS v1,
         |    CAST(sum(CAST(a AS HUGEINT) * x * x * $e9) AS HUGEINT) AS v2
         |  FROM cells JOIN c${k - 1} USING (g) GROUP BY 1, 2),
         |sf$k AS (
         |  SELECT *,
         |    CAST(sum(v0) OVER (PARTITION BY g ORDER BY dur DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS s0,
         |    CAST(sum(v1) OVER (PARTITION BY g ORDER BY dur DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS s1,
         |    CAST(sum(v2) OVER (PARTITION BY g ORDER BY dur DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS s2
         |  FROM sp$k),
         |ag$k AS (
         |  SELECT g, first(b) AS b0,
         |    CAST(sum($ut) AS HUGEINT) AS su,
         |    CAST(sum($it) AS HUGEINT) AS si
         |  FROM sf$k WHERE d > 0 GROUP BY 1),
         |c$k AS (
         |  SELECT g, $BNextSql AS b, si
         |  FROM (SELECT g, CAST(su AS DOUBLE) / 1e9 AS su,
         |          CAST(si AS DOUBLE) / 1e9 AS si, b0 AS b FROM ag$k))"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH per_cust AS (
       |  SELECT o_custkey,
       |    min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS first_d,
       |    max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS last_d
       |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
       |mx AS (SELECT max(last_d) AS mx FROM per_cust),
       |obs AS (
       |  SELECT c_mktsegment AS g,
       |    CAST(last_d - first_d AS BIGINT) AS dur,
       |    CASE WHEN last_d < mx - 90 THEN 1 ELSE 0 END AS event,
       |    -CAST(floor(c_acctbal / 100.0) AS BIGINT) AS x
       |  FROM per_cust CROSS JOIN mx
       |  JOIN customer ON o_custkey = c_custkey),
       |cells AS (
       |  SELECT g, dur, x, CAST(count(*) AS BIGINT) AS a,
       |    CAST(sum(event) AS BIGINT) AS e
       |  FROM obs GROUP BY 1, 2, 3),
       |tot AS (SELECT g, CAST(sum(a) AS BIGINT) AS n_subjects,
       |               CAST(sum(e) AS BIGINT) AS n_events
       |        FROM cells GROUP BY 1),
       |c0 AS (SELECT g, CAST(0e0 AS DOUBLE) AS b,
       |              CAST(NULL AS DOUBLE) AS si FROM tot),
       |$iterCtes,
       |fin AS (
       |  SELECT g, n_subjects, n_events,
       |    round(b, 6) + 0.0 AS beta,
       |    round(1.0 / sqrt(nullif(si, 0.0)), 6) + 0.0 AS se_beta,
       |    round(b * sqrt(nullif(si, 0.0)), 4) + 0.0 AS z_cox,
       |    round(CAST(floor(exp(least(greatest(b, -18e0), 18e0)) * 1e9
       |      + 5e-1) AS DOUBLE) / 1e9, 6) + 0.0 AS hazard_ratio
       |  FROM tot LEFT JOIN c$Iters USING (g))
       |SELECT g AS c_mktsegment, n_subjects, n_events, beta, se_beta,
       |  z_cox, hazard_ratio,
       |  round(${pSql("z_cox")}, 6) + 0.0 AS p_value
       |FROM fin""".stripMargin
  }
}
