package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.textstats.QualityModel

/** Thresholded confusion-matrix metrics — the DECISION-point readout
  * the eval deck was missing: q83's AUC grades the scorer across ALL
  * thresholds, q171's AP rewards early rank, q156 reads probability
  * calibration — but a deployed corpus filter runs at ONE cut, and
  * what ships is its confusion matrix. This operator reports the four
  * exact cells (tp/fp/fn/tn) plus the six standard derived rates:
  *
  *   precision = tp/(tp+fp)     recall = tp/(tp+fn)
  *   f1 = 2pr/(p+r)             accuracy = (tp+tn)/n
  *   fpr = fp/(fp+tn)
  *   mcc = (tp·tn − fp·fn)/√((tp+fp)(tp+fn)(tn+fp)(tn+fn))
  *
  * Exactness: the cells are exact BIGINT sums of 0/1 indicators from
  * ONE aggregate — nothing to snap; every rate is one shared-text
  * rational chain on exact-integer casts (exact-int→double casts are
  * correctly rounded IEEE in both engines — the q134 rule), sqrt is
  * correctly rounded on a bit-identical operand, degenerate
  * denominators → NULL via nullif. No distributional fiction anywhere.
  *
  * Plan/scale: the scored frame is one corpus-touch keyed aggregate
  * (the q61 scorer), the label decorate a key join, the matrix ONE
  * map-side-combined global aggregate → a 1-row finish. No windows. */
object Confusion {

  private def rateSql(num: String, den: String): String =
    s"round(CAST($num AS DOUBLE) / nullif(CAST($den AS DOUBLE), 0.0), 6) + 0.0"

  /** Confusion metrics of binary `pred` against binary `label`
    * (both 0/1 ints; NULL rows excluded up front — the q83 eval
    * convention). One row: cells + derived rates. */
  def confusion(df: DataFrame, pred: String, label: String): DataFrame =
    df.filter(col(pred).isNotNull && col(label).isNotNull)
      .selectExpr(s"CAST($pred AS INT) AS p", s"CAST($label AS INT) AS y")
      .agg(
        expr("CAST(sum(p * y) AS BIGINT)").as("tp"),
        expr("CAST(sum(p * (1 - y)) AS BIGINT)").as("fp"),
        expr("CAST(sum((1 - p) * y) AS BIGINT)").as("fn"),
        expr("CAST(sum((1 - p) * (1 - y)) AS BIGINT)").as("tn"))
      .selectExpr("tp", "fp", "fn", "tn",
        rateSql("tp", "tp + fp") + " AS precision",
        rateSql("tp", "tp + fn") + " AS recall",
        rateSql("2 * tp", "2 * tp + fp + fn") + " AS f1",
        rateSql("tp + tn", "tp + fp + fn + tn") + " AS accuracy",
        rateSql("fp", "fp + tn") + " AS fpr",
        "round((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)" +
          " - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))" +
          " / nullif(sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)" +
          " * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)), 0.0), 6)" +
          " + 0.0 AS mcc")

  /** q213: the q61 scorer deployed as an English-document filter at
    * its natural cut (score_sum ≥ 0 — the symmetric ±500 hash-weight
    * scorer's zero is its decision boundary), judged on the SAME
    * shared eval frame as q83/q171/q185/q190 — the fifth lens, and
    * the one that reads the shipped operating point. */
  def qualityConfusion(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    confusion(
      QualityModel.qualityScore(docs)
        .join(docs.select(col("doc_id"),
          (col("lang") === "en").cast("int").as("y")), "doc_id")
        .withColumn("p", (col("score_sum") >= 0).cast("int")),
      "p", "y")
  }

  /** DuckDB twin: the q83 score CTEs, identical cells and chains. */
  val qualityConfusionSql: String = {
    val hash = graft.functions.Hashing.hash48Sql("tok")
    val weight = graft.functions.Hashing.hash48Sql(
      s"'${QualityModel.FeatureSeed}:' || ($hash % ${QualityModel.Buckets})::VARCHAR")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |docscore AS (
       |  SELECT doc_id, CAST(sum($weight % 1001 - 500) AS BIGINT) AS s
       |  FROM toks GROUP BY 1),
       |labeled AS (
       |  SELECT CAST(ds.s >= 0 AS INT) AS p, CAST(d.lang = 'en' AS INT) AS y
       |  FROM documents d JOIN docscore ds USING (doc_id)),
       |cells AS (
       |  SELECT CAST(sum(p * y) AS BIGINT) AS tp,
       |    CAST(sum(p * (1 - y)) AS BIGINT) AS fp,
       |    CAST(sum((1 - p) * y) AS BIGINT) AS fn,
       |    CAST(sum((1 - p) * (1 - y)) AS BIGINT) AS tn
       |  FROM labeled)
       |SELECT tp, fp, fn, tn,
       |  ${rateSql("tp", "tp + fp")} AS precision,
       |  ${rateSql("tp", "tp + fn")} AS recall,
       |  ${rateSql("2 * tp", "2 * tp + fp + fn")} AS f1,
       |  ${rateSql("tp + tn", "tp + fp + fn + tn")} AS accuracy,
       |  ${rateSql("fp", "fp + tn")} AS fpr,
       |  round((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
       |    - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
       |    / nullif(sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
       |    * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)), 0.0), 6)
       |    + 0.0 AS mcc
       |FROM cells""".stripMargin
  }
}
