package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Per-group quantile normalization — the CALIBRATION op the curation
  * deck needs before any global threshold. q27/q61 score documents,
  * but raw score distributions differ BY LANGUAGE (length, stopword
  * inventory), so one global cutoff silently over-filters some
  * languages — the classic curation bias. Quantile normalization maps
  * each language's score onto the POOLED distribution's value at the
  * same quantile (the microarray-normalization construction), after
  * which a single threshold removes the same quantile everywhere.
  *
  * Algorithm — no quadratic join: each group's value cells carry
  * their midpoint quantile as an exact integer (ppb: (2c+cnt)·1e9
  * div 2n); the pooled CDF's step boundaries carry theirs; the two
  * frames INTERLEAVE on one sorted spine and a single "next pooled
  * value at-or-above" window resolves every lookup — the q287
  * bracket idea turned into a merge instead of a join, so the cost is
  * one value-level sort, not cells×cells.
  *
  * Exactness: every quantile is an exact integer in ppb, every value
  * an exact BIGINT, the spine order is total ((q, tag, v) — pooled
  * rows first at ties so at-or-above is inclusive), and the per-group
  * means are integer divisions. Nothing rounds but the display.
  *
  * Plan/scale: one corpus scan → per-group and pooled VALUE cells →
  * one global window over their union (value-level, the q83/q287
  * class — bounded by distinct-score cardinality) → one keyed
  * aggregate. */
object QuantileNorm {

  /** Normalization summary per group from (g, v BIGINT): one row per
    * group — (g, n_rows, mean_raw, mean_norm): group mean before and
    * after mapping onto the pooled distribution (shared-text doubles
    * over exact sums, round-4). */
  def quantileNormSummary(rows: DataFrame): DataFrame = {
    val cells = rows
      .filter(col("g").isNotNull && col("v").isNotNull)
      .groupBy("g", "v")
      .agg(expr("CAST(count(1) AS BIGINT)").as("cnt"))
      .localCheckpoint(true) // probes + pooled spine + totals
    val wg = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val probes = cells
      .withColumn("c", coalesce(sum("cnt").over(wg), lit(0L)))
      .withColumn("n_g", sum("cnt").over(Window.partitionBy("g")))
      .selectExpr("g", "v", "cnt",
        "(2 * c + cnt) * 1000000000 div (2 * n_g) AS q_ppb",
        "CAST(1 AS INT) AS tag", "CAST(NULL AS BIGINT) AS pv")
    val pool = cells.groupBy("v").agg(expr("CAST(sum(cnt) AS BIGINT)").as("pc"))
    val poolCum = pool
      .withColumn("cum", sum("pc").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(pool.agg(
        expr("CAST(sum(pc) AS BIGINT)").as("n_all"))))
      .selectExpr("CAST(NULL AS STRING) AS g", "v",
        "CAST(0 AS BIGINT) AS cnt",
        "cum * 1000000000 div n_all AS q_ppb",
        "CAST(0 AS INT) AS tag", "v AS pv")
    // desc walk: the running last pooled value = first pooled step
    // with q' ≥ q (tag asc at ties keeps at-or-above INCLUSIVE)
    val wSpine = Window.orderBy(col("q_ppb").desc, col("tag").asc,
      col("pv").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probes.unionByName(poolCum)
      .withColumn("target", last("pv", ignoreNulls = true).over(wSpine))
      .filter(col("tag") === 1)
      .groupBy("g")
      .agg(
        expr("CAST(sum(cnt) AS BIGINT)").as("n_rows"),
        expr("CAST(sum(v * cnt) AS DECIMAL(38,0))").as("sv"),
        expr("CAST(sum(target * cnt) AS DECIMAL(38,0))").as("st"))
      // means as ONE shared-text double division of exact sums (the
      // sums stay < 2^53, so the doubles are exact; a div/`//` pair
      // would disagree on NEGATIVE means — trunc vs floor)
      .selectExpr("g", "n_rows",
        "round(CAST(sv AS DOUBLE) / CAST(n_rows AS DOUBLE), 4) + 0.0" +
          " AS mean_raw",
        "round(CAST(st AS DOUBLE) / CAST(n_rows AS DOUBLE), 4) + 0.0" +
          " AS mean_norm")
  }

  /** q300: calibrate the q61 hashed-feature quality score across
    * languages — after normalization every language's mean sits at
    * the pooled level, so one global gate is fair. */
  def langScoreNorm(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    quantileNormSummary(
      QualityModel.qualityScore(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .selectExpr("lang AS g", "CAST(score_sum AS BIGINT) AS v"))
      .withColumnRenamed("g", "lang")
  }

  /** DuckDB twin: q61's exact score derivation, identical ppb spine,
    * the same inclusive desc walk. */
  val langScoreNormSql: String = {
    val hash = graft.functions.Hashing.hash48Sql("tok")
    val weight = graft.functions.Hashing.hash48Sql(
      s"'${QualityModel.FeatureSeed}:' || ($hash % ${QualityModel.Buckets})::VARCHAR")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |docscore AS (
       |  SELECT doc_id, CAST(sum($weight % 1001 - 500) AS BIGINT) AS v
       |  FROM toks GROUP BY 1),
       |labeled AS (
       |  SELECT d.lang AS g, v
       |  FROM documents d JOIN docscore USING (doc_id)
       |  WHERE d.lang IS NOT NULL),
       |cells AS (
       |  SELECT g, v, CAST(count(*) AS BIGINT) AS cnt
       |  FROM labeled GROUP BY 1, 2),
       |probes AS (
       |  SELECT g, v, cnt,
       |    (2 * coalesce(CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |      + cnt) * 1000000000
       |      // (2 * CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT)) AS q_ppb,
       |    CAST(1 AS INT) AS tag, CAST(NULL AS BIGINT) AS pv
       |  FROM cells),
       |pool AS (
       |  SELECT v, CAST(sum(cnt) AS BIGINT) AS pc FROM cells GROUP BY 1),
       |pool_cum AS (
       |  SELECT CAST(NULL AS STRING) AS g, v, CAST(0 AS BIGINT) AS cnt,
       |    CAST(sum(pc) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      * 1000000000 // (SELECT CAST(sum(pc) AS BIGINT) FROM pool)
       |      AS q_ppb,
       |    CAST(0 AS INT) AS tag, v AS pv
       |  FROM pool),
       |spine AS (
       |  SELECT *, last_value(pv IGNORE NULLS) OVER (
       |      ORDER BY q_ppb DESC, tag ASC, pv DESC NULLS LAST
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS target
       |  FROM (SELECT * FROM probes UNION ALL SELECT * FROM pool_cum))
       |SELECT g AS lang, CAST(sum(cnt) AS BIGINT) AS n_rows,
       |  round(CAST(CAST(sum(CAST(v AS HUGEINT) * cnt) AS HUGEINT) AS DOUBLE)
       |    / CAST(CAST(sum(cnt) AS BIGINT) AS DOUBLE), 4) + 0.0 AS mean_raw,
       |  round(CAST(CAST(sum(CAST(target AS HUGEINT) * cnt) AS HUGEINT)
       |      AS DOUBLE)
       |    / CAST(CAST(sum(cnt) AS BIGINT) AS DOUBLE), 4) + 0.0 AS mean_norm
       |FROM spine WHERE tag = 1 GROUP BY 1""".stripMargin
  }
}
