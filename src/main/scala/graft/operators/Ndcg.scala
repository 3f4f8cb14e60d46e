package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.textstats.QualityModel

/** NDCG@k — the position-discounted rung of the eval deck: q83's AUC
  * is rank-global, q171's AP rewards early precision, q185's lift
  * reads block capture; NDCG is the metric that says position 1
  * matters more than position 5 on a LOG discount — the standard
  * scoreboard for "the filter's top-of-list is what downstream
  * consumes".
  *
  * Tie convention (deterministic, order-free): a tie cell spanning
  * positions p+1..p+nt with np positives contributes
  * np·(Σ discounts of its positions)/nt — the exact expectation over
  * within-cell permutations, so no tie is ever broken by partition
  * order. Ideal DCG packs all positives first on the same discount
  * table.
  *
  * Exactness: positions come from the q83 score-cell walk (exact
  * BIGINT cumulative counts); the discount table 1/log₂(i+1) for
  * i ≤ k is a BROADCAST k-row frame with each discount snapped to the
  * 1e-9 grid (one ln per POSITION, not per row); per-cell sums are
  * rationals of exact integers assembled in ONE shared-text chain;
  * DCG/IDCG/NDCG are snapped sums of those cell terms on a 1e-12
  * integer grid (order-free).
  *
  * Plan/scale: the q83 cell aggregate → cells overlapping the top-k
  * window (≤ k of them) exploded against the k-row discount spine —
  * the explode is K-BOUNDED by construction, never corpus-bounded —
  * then a 1-row finish. */
object Ndcg {

  /** NDCG@k of `score` predicting binary `label`. Returns one row:
    * (k, n_rows, n_pos, dcg, idcg, ndcg) — NULL ndcg when no
    * positive exists. */
  def ndcgAtK(df: DataFrame, score: String, label: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    val byScore = df
      .filter(col(score).isNotNull && col(label).isNotNull)
      .groupBy(col(score).as("s"))
      .agg(sum(col(label).cast("long")).as("np"), count(lit(1)).as("nt"))
    val wDesc = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // discount spine: position i → ⌊1e9/log2(i+1)⌉, exact and tiny
    val discounts = spark.range(1, k + 1L).toDF("pos")
      .selectExpr("pos", "CAST(floor(1e9 / (ln(CAST(pos + 1 AS DOUBLE))" +
        " / ln(2.0)) + 5e-1) AS BIGINT) AS disc")
    val cells = byScore
      .withColumn("cb", coalesce(sum(col("nt")).over(wDesc), lit(0L)))
      .withColumn("n_all", expr("CAST(sum(nt) OVER () AS BIGINT)"))
      .withColumn("pos_all", expr("CAST(sum(np) OVER () AS BIGINT)"))
      .filter(col("cb") < k) // only cells overlapping the top-k window
      .localCheckpoint(true) // feeds the real AND ideal walks
    val dcg = cells
      .join(broadcast(discounts),
        col("pos") > col("cb") && col("pos") <= col("cb") + col("nt"), "inner")
      .groupBy("cb", "nt", "np", "n_all", "pos_all")
      .agg(expr("CAST(sum(disc) AS BIGINT)").as("dsum"))
      // cell term: np·(Σdisc)/nt on the 1e-12 grid (shared text)
      .selectExpr("n_all", "pos_all",
        "CAST(floor(CAST(np AS DOUBLE) * CAST(dsum AS DOUBLE)" +
          " / CAST(nt AS DOUBLE) * 1e3 + 5e-1) AS BIGINT) AS term")
      .groupBy("n_all", "pos_all")
      .agg(expr("CAST(sum(term) AS BIGINT)").as("dcg_pico"))
    val idcg = cells
      .groupBy("n_all", "pos_all").agg(lit(1).as("one")).drop("one")
      .join(broadcast(discounts), col("pos") <= col("pos_all"), "inner")
      .groupBy("n_all", "pos_all")
      .agg(expr("CAST(sum(disc) * 1000 AS BIGINT)").as("idcg_pico"))
    dcg.join(idcg, Seq("n_all", "pos_all"))
      .selectExpr(s"CAST($k AS BIGINT) AS k", "n_all AS n_rows",
        "pos_all AS n_pos",
        "round(CAST(dcg_pico AS DOUBLE) / 1e12, 6) + 0.0 AS dcg",
        "round(CAST(idcg_pico AS DOUBLE) / 1e12, 6) + 0.0 AS idcg",
        "round(CAST(dcg_pico AS DOUBLE)" +
          " / nullif(CAST(idcg_pico AS DOUBLE), 0.0), 6) + 0.0 AS ndcg")
  }

  /** q190: NDCG@20 of the q61 quality scorer retrieving English
    * documents — the top-of-list scoreboard on the q83/q171/q185
    * shared eval frame. */
  def qualityNdcg(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = QualityModel.qualityScore(docs)
      .join(docs.select(col("doc_id"),
        (col("lang") === "en").cast("int").as("y")), "doc_id")
    ndcgAtK(scored, "score_sum", "y", 20)
  }

  /** DuckDB twin: identical cells, discount spine, tie expectation. */
  val qualityNdcgSql: String = {
    val hash = graft.functions.Hashing.hash48Sql("tok")
    val weight = graft.functions.Hashing.hash48Sql(
      s"'${QualityModel.FeatureSeed}:' || ($hash % ${QualityModel.Buckets})::VARCHAR")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |docscore AS (
       |  SELECT doc_id, CAST(sum($weight % 1001 - 500) AS BIGINT) AS s
       |  FROM toks GROUP BY 1),
       |labeled AS (
       |  SELECT ds.s, CAST(d.lang = 'en' AS INT) AS y
       |  FROM documents d JOIN docscore ds USING (doc_id)),
       |by_score AS (
       |  SELECT s, CAST(sum(y) AS BIGINT) AS np, count(*) AS nt
       |  FROM labeled GROUP BY 1),
       |discounts AS (
       |  SELECT pos, CAST(floor(1e9 / (ln(CAST(pos + 1 AS DOUBLE))
       |    / ln(2.0)) + 5e-1) AS BIGINT) AS disc
       |  FROM (SELECT unnest(generate_series(1, 20)) AS pos)),
       |cells AS (
       |  SELECT *,
       |    coalesce(CAST(sum(nt) OVER (ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      0) AS cb,
       |    CAST(sum(nt) OVER () AS BIGINT) AS n_all,
       |    CAST(sum(np) OVER () AS BIGINT) AS pos_all
       |  FROM by_score),
       |topcells AS (SELECT * FROM cells WHERE cb < 20),
       |dcg AS (
       |  SELECT n_all, pos_all, CAST(sum(term) AS BIGINT) AS dcg_pico
       |  FROM (
       |    SELECT n_all, pos_all,
       |      CAST(floor(CAST(np AS DOUBLE) * CAST(dsum AS DOUBLE)
       |        / CAST(nt AS DOUBLE) * 1e3 + 5e-1) AS BIGINT) AS term
       |    FROM (
       |      SELECT cb, nt, np, n_all, pos_all,
       |        CAST(sum(disc) AS BIGINT) AS dsum
       |      FROM topcells JOIN discounts
       |        ON pos > cb AND pos <= cb + nt
       |      GROUP BY 1, 2, 3, 4, 5))
       |  GROUP BY 1, 2),
       |idcg AS (
       |  SELECT n_all, pos_all, CAST(sum(disc) * 1000 AS BIGINT) AS idcg_pico
       |  FROM (SELECT DISTINCT n_all, pos_all FROM topcells)
       |  JOIN discounts ON pos <= pos_all
       |  GROUP BY 1, 2)
       |SELECT CAST(20 AS BIGINT) AS k, n_all AS n_rows, pos_all AS n_pos,
       |  round(CAST(dcg_pico AS DOUBLE) / 1e12, 6) + 0.0 AS dcg,
       |  round(CAST(idcg_pico AS DOUBLE) / 1e12, 6) + 0.0 AS idcg,
       |  round(CAST(dcg_pico AS DOUBLE)
       |    / nullif(CAST(idcg_pico AS DOUBLE), 0.0), 6) + 0.0 AS ndcg
       |FROM dcg JOIN idcg USING (n_all, pos_all)""".stripMargin
  }
}
