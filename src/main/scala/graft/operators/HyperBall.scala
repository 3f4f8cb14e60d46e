package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{ArrayMax, Hashing}

/** HyperBall (Boldi & Vigna 2013, "In-Core Computation of Geometric
  * Centralities with HyperBall") — per-node t-hop NEIGHBORHOOD-SIZE
  * estimation by propagating HLL registers along edges: ball_t(v) is
  * the set of nodes within ≤ t hops of v, and
  *
  *   sketch(ball_t(v)) = max-merge( sketch(ball_{t−1}(v)),
  *                                  sketch(ball_{t−1}(w)) ∀ (v,w) ∈ E )
  *
  * because the ball recurrence is a UNION and HLL registers merge by
  * pointwise max. Exact per-node reach is a quadratic all-pairs BFS —
  * the classic "cannot run at scale" graph statistic; HyperBall makes
  * the whole neighborhood-function/effective-diameter family one
  * |E|-row join per hop. This is the sketch deck composed with the
  * graph deck: q245's register program, per NODE, under q65's graph.
  *
  * Registers are PACKED — one m-int array per node (the
  * [[graft.functions.ArrayMaxAgg]] aggregate), which is Boldi–Vigna's
  * actual layout and the scale-critical choice: row-form (v, b, r)
  * registers would multiply every edge join by the register count
  * (~64×); packed, each hop is edges ⋈ regs (|E| rows of 64-int
  * payloads) → one constant-state aggregate. m = 64 (B–V use 4–7 bit
  * bucket indices for exactly this payload reason): SE ≈ 1.04/√64 =
  * 13% — reach estimation tolerance, documented.
  *
  * EXACTNESS: register contents are integers (hash48 split 6/42 bits,
  * ρ = 43 − len(bin(w))); the per-node denominator S = Σ 2^(43−r) is
  * an exact BIGINT fold over the packed array (zero entries contribute
  * 2⁴³ — identical to the oracle's row-form s_obs + empties·2⁴³); the
  * estimate is one shared-text chain off the driver-rendered
  * α₆₄·m²·2⁴³ literal with the house 1e-9 ln snap on the
  * linear-counting branch; per-node estimates enter the hop average as
  * micro-unit BIGINTs (the q261 move — no double ever sums across
  * nodes).
  *
  * AUDIT (q241 doctrine, stride-bounded truth): exact balls are
  * materialized only for a HASH-STRIDED node sample (the q38
  * membership rule — deterministic, parity-unbiased), so the truth
  * path costs |sample|·|ball| rows instead of |V|·|ball|; the row
  * reports the sketch average over ALL nodes beside sampled-subset
  * sketch-vs-exact and its relative error, per hop 1..3.
  */
object HyperBall {

  /** Registers per node (6-bit bucket index). */
  val M = 64
  /** 2^42 — splits hash48 into (bucket, 42-bit suffix). */
  val BucketDiv = 4398046511104L
  /** 2^43 — the cleared-denominator unit: 2^(43−ρ), ρ ∈ [0, 43]. */
  val Unit = 8796093022208L
  /** α₆₄·m²·2⁴³ — α₆₄ = 0.709 (Flajolet's small-m constant), rendered
    * once by the driver with the shortest round-trip repr so both
    * engines parse the identical double (the Jl.Scale move). */
  val Num: Double = 0.709 * 4096.0 * 8796093022208.0
  /** Linear-counting threshold 2.5·m. */
  val LcThresh = "160.0"
  /** Ball radii reported. */
  val Hops = 3
  /** Radii carrying the exact audit. Hop 3 is sketch-only BY DESIGN:
    * the sampled truth at hop t costs Σ_{(v,w)∈ball_t×sample} outdeg(w)
    * join rows, and on this dense graph hop-2 balls already cover most
    * of the graph — the hop-3 truth join measured ~400M rows, i.e. the
    * exact quadratic blow-up HyperBall exists to avoid. The estimator
    * is hop-uniform (same registers, same chain), so hops 1–2 audit
    * the machinery and hop 3 reports the production-mode number. */
  val ExactHops = 2
  /** Hash-stride modulus for the exact-audit node sample. */
  val Stride = 101

  private def lnSnap(x: String): String =
    s"CAST(floor(ln($x) * 1e9 + 5e-1) AS DOUBLE) / 1e9"

  /** Shared per-node estimate texts off (v_zero, s). */
  private def estChain(df: DataFrame): DataFrame =
    df.selectExpr("v", "sampled", s"$Num / CAST(s AS DOUBLE) AS raw", "v_zero")
      .selectExpr("v", "sampled",
        s"CASE WHEN raw <= $LcThresh AND v_zero > 0 THEN" +
          s" 64.0 * ${lnSnap("64.0 / CAST(v_zero AS DOUBLE)")}" +
          " ELSE raw END AS est")
      .selectExpr("v", "sampled",
        "CAST(floor(est * 1e6 + 5e-1) AS BIGINT) AS em")

  /** q271: the neighborhood function over the q65 supplier–part graph
    * — one row per hop t = 1..3. */
  def supplierPartHyperBall(spark: SparkSession, dir: String): DataFrame = {
    val sp = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
      .distinct()
    neighborhoodFunction(
      sp.selectExpr("s * 2 AS src", "p * 2 + 1 AS dst")
        .unionByName(sp.selectExpr("p * 2 + 1 AS src", "s * 2 AS dst")))
  }

  /** The hop-1..[[Hops]] neighborhood function over an arbitrary
    * (src, dst) Long edge frame. */
  def neighborhoodFunction(edgesIn: DataFrame): DataFrame = {
    val edges = edgesIn.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(true) // consumed 2× per hop (regs step + ball step)
    val nodes = edges.select(col("src").as("v"))
      .unionByName(edges.select(col("dst").as("v"))).distinct()
      .withColumn("h", Hashing.hash48(col("v").cast("string")))
      .withColumn("sampled", expr(s"CAST(h % $Stride = 0 AS BOOLEAN)"))
      .localCheckpoint(true)
    var regs = nodes
      .selectExpr("v", s"CAST(h div $BucketDiv AS INT) AS b",
        s"CAST(CASE WHEN h % $BucketDiv = 0 THEN 43" +
          s" ELSE 43 - length(bin(h % $BucketDiv)) END AS INT) AS rho")
      .selectExpr("v",
        s"transform(sequence(0, ${M - 1})," +
          " i -> CASE WHEN i = b THEN rho ELSE 0 END) AS arr")
      .localCheckpoint(true)
    var ball = nodes.filter(col("sampled"))
      .selectExpr("v", "v AS w").localCheckpoint(true)
    val hopRows = (1 to Hops).map { t =>
      val nbr = edges
        .join(regs.selectExpr("v AS dst", "arr"), "dst")
        .selectExpr("src AS v", "arr")
      // group by v ALONE and re-attach `sampled` at estimate time: the
      // per-round reattach join was measured at 6x the aggregate's own
      // cost (it reshuffles the |E|-row union); the broadcast lookup at
      // the dimension-grade estimate frame is free by comparison
      regs = regs.select("v", "arr").unionByName(nbr)
        .groupBy("v")
        .agg(ArrayMax.arrayMax(col("arr"), M).as("arr"))
      // iterative: cut the exponential lineage — but only while a NEXT
      // hop will consume the frame twice (regs feeds hop t+1 AND the
      // estimate chain). At the final hop the aggregate has exactly one
      // consumer, so an eager materialization is a wasted extra pass
      // over the largest frame (r17 optimization: one fewer
      // |V|-row×64-int checkpoint per run, same rows out).
      if (t < Hops) regs = regs.localCheckpoint(true)
      if (t <= ExactHops) {
        ball = ball.unionByName(
          ball.join(edges.selectExpr("src AS w", "dst"), "w")
            .selectExpr("v", "dst AS w"))
          .distinct()
        // same single-consumer rule: the hop-ExactHops ball only feeds
        // its own exactAgg — no further expansion reads it
        if (t < ExactHops) ball = ball.localCheckpoint(true)
      }
      val est = estChain(regs
        .join(broadcast(nodes.select("v", "sampled")), "v")
        .selectExpr("v", "sampled",
        "CAST(size(filter(arr, x -> x = 0)) AS BIGINT) AS v_zero",
        "aggregate(arr, CAST(0 AS BIGINT)," +
          " (acc, x) -> acc + shiftleft(CAST(1 AS BIGINT), CAST(43 - x AS INT))) AS s"))
      // one fused aggregate for the all-nodes and sampled-subset sums
      // (conditional branches, not a second pass)
      val allAgg = est.agg(
        expr("CAST(sum(em) AS BIGINT)").as("se_all"),
        expr("CAST(count(1) AS BIGINT)").as("n_all"),
        expr("CAST(sum(CASE WHEN sampled THEN em END) AS BIGINT)").as("se_s"),
        expr("CAST(count(CASE WHEN sampled THEN 1 END) AS BIGINT)").as("n_s"))
      val exactAgg =
        if (t <= ExactHops) ball.agg(
          expr("CAST(count(1) AS BIGINT)").as("sc"),
          expr("CAST(count(DISTINCT v) AS BIGINT)").as("n_e"))
        else ball.sparkSession.sql(
          "SELECT CAST(NULL AS BIGINT) AS sc, CAST(NULL AS BIGINT) AS n_e")
      allAgg.crossJoin(exactAgg).selectExpr(
        s"CAST($t AS INT) AS hop",
        "n_all AS n_nodes", "n_s AS n_sampled",
        "round(CAST(se_all AS DOUBLE) / 1e6 / CAST(n_all AS DOUBLE), 4) + 0.0 AS avg_ball_hll",
        "round(CAST(se_s AS DOUBLE) / 1e6 / nullif(CAST(n_s AS DOUBLE), 0e0), 4) + 0.0 AS avg_ball_hll_sampled",
        "round(CAST(sc AS DOUBLE) / nullif(CAST(n_e AS DOUBLE), 0e0), 4) + 0.0 AS avg_ball_exact_sampled",
        "round((CAST(se_s AS DOUBLE) / 1e6 / nullif(CAST(n_s AS DOUBLE), 0e0)" +
          " - CAST(sc AS DOUBLE) / nullif(CAST(n_e AS DOUBLE), 0e0))" +
          " / (CAST(sc AS DOUBLE) / nullif(CAST(n_e AS DOUBLE), 0e0)), 6) + 0.0 AS rel_err_sampled")
    }
    hopRows.reduce(_ unionByName _)
  }

  /** DuckDB twin: row-form registers (≡ the packed arrays — ρ ≥ 1 so
    * present rows are exactly the non-zero entries), unrolled per-hop
    * max-merges, identical estimate/average texts, the same
    * hash-strided exact balls. */
  val supplierPartHyperBallSql: String = {
    val rhoText = s"CAST(CASE WHEN h % $BucketDiv = 0 THEN 43" +
      s" ELSE 43 - length(bin(h % $BucketDiv)) END AS INT)"
    val hops = (1 to Hops).map { t =>
      val prev = if (t == 1) "g0" else s"g${t - 1}"
      val prevBall = if (t == 1) "b0" else s"b${t - 1}"
      val ballCtes = if (t <= ExactHops)
        s"""b$t AS MATERIALIZED (
           |  SELECT DISTINCT v, w FROM (
           |    SELECT v, w FROM $prevBall
           |    UNION ALL
           |    SELECT b.v, e.dst AS w FROM $prevBall b JOIN edges e ON e.src = b.w)),
           |ex$t AS (
           |  SELECT CAST(count(*) AS BIGINT) AS sc,
           |    CAST(count(DISTINCT v) AS BIGINT) AS n_e FROM b$t),
           |""".stripMargin
      else
        s"""ex$t AS (
           |  SELECT CAST(NULL AS BIGINT) AS sc, CAST(NULL AS BIGINT) AS n_e),
           |""".stripMargin
      s"""g$t AS MATERIALIZED (
         |  SELECT v, b, CAST(max(r) AS INT) AS r FROM (
         |    SELECT v, b, r FROM $prev
         |    UNION ALL
         |    SELECT e.src AS v, g.b, g.r FROM edges e JOIN $prev g ON g.v = e.dst)
         |  GROUP BY 1, 2),
         |${ballCtes}ns$t AS (
         |  SELECT g.v, n.sampled,
         |    CAST($M - count(*) AS BIGINT) AS v_zero,
         |    CAST(sum(1::BIGINT << CAST(43 - g.r AS INT)) AS BIGINT)
         |      + ($M - count(*)) * $Unit AS s
         |  FROM g$t g JOIN nodes n ON n.v = g.v
         |  GROUP BY 1, 2),
         |ev$t AS (
         |  SELECT v, sampled,
         |    CAST(floor(est * 1e6 + 5e-1) AS BIGINT) AS em
         |  FROM (
         |    SELECT v, sampled,
         |      CASE WHEN raw <= $LcThresh AND v_zero > 0 THEN
         |        64.0 * ${lnSnap("64.0 / CAST(v_zero AS DOUBLE)")}
         |      ELSE raw END AS est
         |    FROM (SELECT v, sampled, $Num / CAST(s AS DOUBLE) AS raw, v_zero
         |          FROM ns$t))),
         |alla$t AS (
         |  SELECT CAST(sum(em) AS BIGINT) AS se_all,
         |    CAST(count(*) AS BIGINT) AS n_all,
         |    CAST(sum(CASE WHEN sampled THEN em END) AS BIGINT) AS se_s,
         |    CAST(count(CASE WHEN sampled THEN 1 END) AS BIGINT) AS n_s
         |  FROM ev$t)"""
        .stripMargin
    }.mkString(",\n")
    val rows = (1 to Hops).map { t =>
      s"""SELECT CAST($t AS INT) AS hop,
         |  n_all AS n_nodes, n_s AS n_sampled,
         |  round(CAST(se_all AS DOUBLE) / 1e6 / CAST(n_all AS DOUBLE), 4) + 0.0 AS avg_ball_hll,
         |  round(CAST(se_s AS DOUBLE) / 1e6 / nullif(CAST(n_s AS DOUBLE), 0e0), 4) + 0.0 AS avg_ball_hll_sampled,
         |  round(CAST(sc AS DOUBLE) / nullif(CAST(n_e AS DOUBLE), 0e0), 4) + 0.0 AS avg_ball_exact_sampled,
         |  round((CAST(se_s AS DOUBLE) / 1e6 / nullif(CAST(n_s AS DOUBLE), 0e0)
         |    - CAST(sc AS DOUBLE) / nullif(CAST(n_e AS DOUBLE), 0e0))
         |    / (CAST(sc AS DOUBLE) / nullif(CAST(n_e AS DOUBLE), 0e0)), 6) + 0.0 AS rel_err_sampled
         |FROM alla$t, ex$t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH sp AS (
       |  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
       |edges AS MATERIALIZED (
       |  SELECT s * 2 AS src, p * 2 + 1 AS dst FROM sp
       |  UNION ALL
       |  SELECT p * 2 + 1 AS src, s * 2 AS dst FROM sp),
       |nodes AS MATERIALIZED (
       |  SELECT v, h, h % $Stride = 0 AS sampled FROM (
       |    SELECT v, ${Hashing.hash48Sql("CAST(v AS VARCHAR)")} AS h
       |    FROM (SELECT DISTINCT src AS v FROM edges))),
       |g0 AS (
       |  SELECT v, CAST(h // $BucketDiv AS INT) AS b, $rhoText AS r
       |  FROM nodes),
       |b0 AS (SELECT v, v AS w FROM nodes WHERE sampled),
       |$hops
       |$rows""".stripMargin
  }
}
