package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Markov entropy rate — "how PREDICTABLE is the next step?", the
  * information-theoretic readout over q50's transition matrix: q50
  * shows the probabilities, q129 scores token entropy per document;
  * this collapses a whole behavioral chain to one number-pair —
  * conditional next-step entropy H (bits) and its perplexity 2^H
  * ("effectively how many next-states is a user choosing among?"),
  * with the marginal next-state entropy H₀ alongside so the
  * PREDICTABILITY GAIN H₀ − H (how much the current state tells you)
  * is read directly.
  *
  *   H  = −Σ_a π̂_a Σ_b p̂_{ab} log₂ p̂_{ab}   (empirical source weights)
  *   H₀ = −Σ_b q̂_b log₂ q̂_b
  *
  * Exactness: transition CELLS (k² dimension-grade integers) carry
  * everything; each cell's −(n_ab/N)·log₂(n_ab/n_a·) term is ONE
  * shared-text double from exact BIGINTs, snapped to a 1e-12 integer
  * grid and summed order-free (the q187 discipline); same for the
  * marginal. log₂ via ln/ln(2.0) (shared text); 2^H via the snapped
  * exp chain (q94).
  *
  * Plan/scale: the q50 lag-window per user (event-order windows are
  * user-bounded — the q18 adjudication) → one k²-cell aggregate →
  * broadcast totals → a 1-row finish. */
object MarkovEntropy {

  /** Entropy rate from a transition-cell frame (a, b, n): from-state,
    * to-state, exact BIGINT count. Returns one row:
    * (n_transitions, k_states, h_cond_bits, h_marg_bits, info_gain,
    * perplexity). */
  def entropyRate(cells: DataFrame): DataFrame = {
    val base = cells.select("a", "b", "n").localCheckpoint(true)
    val rowTotals = base.groupBy("a")
      .agg(expr("CAST(sum(n) AS BIGINT)").as("n_a"))
    val colTotals = base.groupBy("b")
      .agg(expr("CAST(sum(n) AS BIGINT)").as("n_b"))
    val grand = base.agg(
      expr("CAST(sum(n) AS BIGINT)").as("n_all"),
      expr("CAST(count(DISTINCT b) AS BIGINT)").as("k_states"))
    val cond = base.join(broadcast(rowTotals), "a")
      .crossJoin(broadcast(grand))
      .selectExpr("n_all", "k_states",
        s"CAST(floor($CellTermSql * 1e12 + 5e-1) AS BIGINT) AS term")
      .groupBy("n_all", "k_states")
      .agg(expr("CAST(sum(term) AS BIGINT)").as("h_pico"))
    val marg = colTotals.crossJoin(broadcast(grand))
      .selectExpr("n_all AS n_all_m",
        s"CAST(floor($MargTermSql0 * 1e12 + 5e-1) AS BIGINT) AS term")
      .groupBy("n_all_m")
      .agg(expr("CAST(sum(term) AS BIGINT)").as("h0_pico"))
    cond.join(marg, col("n_all") === col("n_all_m"))
      .selectExpr("n_all AS n_transitions", "k_states",
        "round(CAST(h_pico AS DOUBLE) / 1e12, 6) + 0.0 AS h_cond_bits",
        "round(CAST(h0_pico AS DOUBLE) / 1e12, 6) + 0.0 AS h_marg_bits",
        "round(CAST(h0_pico - h_pico AS DOUBLE) / 1e12, 6) + 0.0" +
          " AS info_gain",
        "round(CAST(floor(exp(CAST(h_pico AS DOUBLE) / 1e12 * ln(2.0))" +
          " * 1e9 + 5e-1) AS DOUBLE) / 1e9, 6) + 0.0 AS perplexity")
  }

  // −(n/N)·log₂(n/n_a) — exact-integer inputs, one shared text
  private val CellTermSql =
    "(-(CAST(n AS DOUBLE) / CAST(n_all AS DOUBLE))" +
      " * (ln(CAST(n AS DOUBLE) / CAST(n_a AS DOUBLE)) / ln(2.0)))"

  /** q191: how predictable is a user's NEXT event type given the
    * current one, over the q50 transition chain? */
  def eventEntropyRate(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    entropyRate(Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("a", lag(col("event_type"), 1).over(byUser))
      .filter(col("a").isNotNull)
      .groupBy(col("a"), col("event_type").as("b"))
      .agg(expr("CAST(count(1) AS BIGINT)").as("n")))
  }

  /** DuckDB twin: identical lag chain, cells, snapped terms. */
  val eventEntropyRateSql: String =
    s"""WITH seqd AS (
       |  SELECT user_id, event_type,
       |    lag(event_type, 1) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS a
       |  FROM events),
       |cells AS (
       |  SELECT a, event_type AS b, CAST(count(*) AS BIGINT) AS n
       |  FROM seqd WHERE a IS NOT NULL GROUP BY 1, 2),
       |row_totals AS (
       |  SELECT a, CAST(sum(n) AS BIGINT) AS n_a FROM cells GROUP BY 1),
       |col_totals AS (
       |  SELECT b, CAST(sum(n) AS BIGINT) AS n_b FROM cells GROUP BY 1),
       |grand AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS n_all,
       |    CAST(count(DISTINCT b) AS BIGINT) AS k_states
       |  FROM cells),
       |cond AS (
       |  SELECT n_all, k_states, CAST(sum(term) AS BIGINT) AS h_pico
       |  FROM (
       |    SELECT n_all, k_states,
       |      CAST(floor($CellTermSql * 1e12 + 5e-1) AS BIGINT) AS term
       |    FROM cells JOIN row_totals USING (a) CROSS JOIN grand)
       |  GROUP BY 1, 2),
       |marg AS (
       |  SELECT n_all_m, CAST(sum(term) AS BIGINT) AS h0_pico
       |  FROM (
       |    SELECT n_all AS n_all_m,
       |      CAST(floor($MargTermSql0 * 1e12 + 5e-1) AS BIGINT) AS term
       |    FROM col_totals CROSS JOIN grand)
       |  GROUP BY 1)
       |SELECT n_all AS n_transitions, k_states,
       |  round(CAST(h_pico AS DOUBLE) / 1e12, 6) + 0.0 AS h_cond_bits,
       |  round(CAST(h0_pico AS DOUBLE) / 1e12, 6) + 0.0 AS h_marg_bits,
       |  round(CAST(h0_pico - h_pico AS DOUBLE) / 1e12, 6) + 0.0
       |    AS info_gain,
       |  round(CAST(floor(exp(CAST(h_pico AS DOUBLE) / 1e12 * ln(2.0))
       |    * 1e9 + 5e-1) AS DOUBLE) / 1e9, 6) + 0.0 AS perplexity
       |FROM cond JOIN marg ON n_all = n_all_m""".stripMargin

  // twin-side marginal term before the n_all alias exists
  private def MargTermSql0 =
    "(-(CAST(n_b AS DOUBLE) / CAST(n_all AS DOUBLE))" +
      " * (ln(CAST(n_b AS DOUBLE) / CAST(n_all AS DOUBLE)) / ln(2.0)))"
}
