package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.textstats.QualityModel

/** ROC operating points — the CURVE q83 integrates. AUC (q83) answers
  * "does the score rank positives above negatives at all?"; an operator
  * picking a gating threshold for a corpus-quality filter needs the
  * operating points themselves: at threshold t, what fraction of the
  * good documents survive (TPR) and what fraction of the bad ones leak
  * through (FPR)? The registered grid reports 21 evenly-spaced
  * thresholds across the observed score span plus Youden's J
  * (TPR − FPR), whose argmax is the textbook single-threshold choice.
  *
  * Exactness: scores are exact integers (q61's score_sum), so every
  * quantity is integral end-to-end — per-distinct-score cells
  * (n⁺, n_total) from ONE map-side-combined aggregate, thresholds
  * t_k = s_min + ((s_max − s_min)·k) div 20, TP/FP as conditional
  * integer sums over the cells, rates in exact ppm by integer floor
  * division (the q83/q87 convention). No doubles anywhere.
  *
  * Plan/scale: one corpus scan → value-level score cells (cardinality
  * bounded by the score range, the q68/q83 precedent) → a 21-row
  * broadcast threshold frame crossed against the cells → ONE keyed
  * aggregate producing exactly 21 rows. The corpus is touched once;
  * everything after the first aggregate is value-level. At 100 TB the
  * only scaling term is distinct-score cardinality × 21 — still tiny.
  */
object Roc {

  /** Number of grid steps (21 thresholds, k = 0..Steps). */
  val Steps = 20

  /** ROC grid of `score` (integer) predicting binary `label` (0/1).
    * NULL scores/labels are excluded up front (the q83 rationale:
    * engine NULL-sort order must never shift a cumulative).
    * @return Steps+1 rows: (k, thr, tp, fp, tpr_ppm, fpr_ppm,
    *         youden_ppm) — rate columns NULL when a class is empty. */
  def rocGrid(df: DataFrame, score: String, label: String): DataFrame = {
    val cells = df
      .filter(col(score).isNotNull && col(label).isNotNull)
      .groupBy(col(score).cast("long").as("s"))
      .agg(sum(col(label).cast("long")).as("np"), count(lit(1)).as("nt"))
    val thr = cells
      .agg(min("s").as("smin"), max("s").as("smax"))
      .select(explode(expr(s"sequence(0, $Steps)")).as("k"),
        col("smin"), col("smax"))
      .withColumn("thr",
        expr(s"smin + ((smax - smin) * k) div $Steps"))
      .select("k", "thr")
    cells.crossJoin(broadcast(thr))
      .groupBy("k", "thr")
      .agg(
        sum(when(col("s") >= col("thr"), col("np")).otherwise(0L)).as("tp"),
        sum(when(col("s") >= col("thr"), col("nt") - col("np"))
          .otherwise(0L)).as("fp"),
        sum(col("np")).as("p_tot"),
        sum(col("nt") - col("np")).as("n_tot"))
      .selectExpr("k", "thr", "tp", "fp",
        "tp * 1000000 div nullif(p_tot, 0) AS tpr_ppm",
        "fp * 1000000 div nullif(n_tot, 0) AS fpr_ppm")
      .selectExpr("k", "thr", "tp", "fp", "tpr_ppm", "fpr_ppm",
        "tpr_ppm - fpr_ppm AS youden_ppm")
  }

  /** q277: the operating curve of the q61 hashed-feature quality score
    * against the English label — the threshold-picking companion of
    * q83's AUC on the identical scored frame. */
  def qualityRoc(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = QualityModel.qualityScore(docs)
      .join(docs.select(col("doc_id"),
        (col("lang") === "en").cast("int").as("y")), "doc_id")
    rocGrid(scored, "score_sum", "y")
  }

  /** DuckDB twin: q83's exact score derivation, the same value-level
    * cells, the same integer threshold grid. */
  val qualityRocSql: String = {
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
       |cells AS (
       |  SELECT s, CAST(sum(y) AS BIGINT) AS np, count(*) AS nt
       |  FROM labeled GROUP BY 1),
       |span AS (SELECT min(s) AS smin, max(s) AS smax FROM cells),
       |thr AS (
       |  SELECT CAST(unnest(generate_series(0, $Steps)) AS BIGINT) AS k,
       |    smin, smax
       |  FROM span),
       |grid AS (
       |  SELECT k, smin + ((smax - smin) * k) // $Steps AS thr FROM thr),
       |agg AS (
       |  SELECT k, thr,
       |    CAST(sum(CASE WHEN s >= thr THEN np ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN s >= thr THEN nt - np ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(np) AS BIGINT) AS p_tot,
       |    CAST(sum(nt - np) AS BIGINT) AS n_tot
       |  FROM cells CROSS JOIN grid GROUP BY 1, 2),
       |rates AS (
       |  SELECT k, thr, tp, fp,
       |    tp * 1000000 // nullif(p_tot, 0) AS tpr_ppm,
       |    fp * 1000000 // nullif(n_tot, 0) AS fpr_ppm
       |  FROM agg)
       |SELECT k, thr, tp, fp, tpr_ppm, fpr_ppm,
       |  tpr_ppm - fpr_ppm AS youden_ppm
       |FROM rates""".stripMargin
  }
}
