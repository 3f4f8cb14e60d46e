package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Benchmark-contamination detection: flag training documents whose
  * n-gram shingles overlap a held-out benchmark/eval set — the standard
  * decontamination step before an LLM training run (exact n-gram
  * collision against the eval suites, cf. the public GPT-3/PaLM
  * appendix methodology).
  *
  * Scale shape: the benchmark side is an eval suite — tiny relative to
  * a 100 TB corpus — so its distinct shingle set is BROADCAST and the
  * probe is a shuffle-free broadcast semi-join over the corpus scan,
  * followed by one map-side-combined per-doc aggregate. The corpus side
  * never shuffles its text, only (doc_id, shingle-key) longs.
  *
  * Here the "benchmark" is the deterministic slice doc_id % 20 == 0 of
  * the `documents` table; everything else is the corpus under test.
  */
object Contamination {

  val BenchmarkMod = 20
  /** Flag a doc when this fraction of its distinct shingles collides
    * with the benchmark set. */
  val ContaminationFrac = 0.5

  def contamination(docs: DataFrame): DataFrame = {
    // distinct (doc_id, shk) — Jaccard-style working set per side.
    // The corpus side is consumed ONCE: a left broadcast join marks
    // benchmark collisions and a single map-side-combined aggregate
    // produces both the total and the hit count (count over a nullable
    // marker), so the expensive shingle projection never re-runs and
    // there is no totals-vs-hits re-join. The benchmark subtree still
    // evaluates separately, but it is the tiny side by construction.
    val shingles = Dedup.docShingles(docs).distinct()
    val bench = shingles
      .filter(col("doc_id") % BenchmarkMod === 0)
      .select(col("shk")).distinct()
      .withColumn("hit", lit(1))
    val corpus = shingles.filter(col("doc_id") % BenchmarkMod =!= 0)
    corpus
      .join(broadcast(bench), Seq("shk"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hit"))
      .withColumn("contam_frac",
        round(col("n_hit").cast("double") / col("n_shingles").cast("double"), 4) + 0.0)
      .withColumn("contaminated",
        (col("contam_frac") >= ContaminationFrac).cast("int"))
      .select(col("doc_id"), col("n_shingles"), col("n_hit"),
        col("contam_frac"), col("contaminated"))
  }

  def contamination(spark: SparkSession, dir: String): DataFrame =
    contamination(Tables.documents(spark, dir))

  /** Streaming twin: incoming docs checked against a STATIC benchmark
    * shingle set (eval suites change rarely — they are a static frame a
    * stream-static broadcast join probes). Per-doc distinct shingles
    * come from `array_distinct` BEFORE the explode — a pure projection,
    * so the only state is the windowed per-doc aggregate, bounded by
    * the watermark. Emits the same n_shingles/n_hit/contam_frac as the
    * batch operator for every doc inside a window.
    *
    * @param docs streaming (ts TIMESTAMP, doc_id LONG, text STRING)
    * @param benchShingles static frame with a distinct `shk` column
    *   (e.g. `Dedup.docShingles(benchDocs).select("shk").distinct()`)
    */
  def contaminationStream(docs: org.apache.spark.sql.DataFrame,
      benchShingles: org.apache.spark.sql.DataFrame,
      watermark: String = "1 hour", windowLen: String = "1 hour"): org.apache.spark.sql.DataFrame = {
    val sk = docs
      // th materialized as its own projection first — the SURVEY §5
      // inlining trap (same reason Dedup.docShingles is two selects)
      .select(col("ts"), col("doc_id"), col("text"),
        Dedup.tokenHashes(col("text")).as("th"))
      .select(col("ts"), col("doc_id"),
        array_distinct(Dedup.shingleKeysFromHashes(col("th"), col("text"))).as("sks"))
      .select(col("ts"), col("doc_id"),
        size(col("sks")).as("n_shingles"), explode(col("sks")).as("shk"))
    sk.withWatermark("ts", watermark)
      .join(broadcast(benchShingles.withColumn("hit", lit(1))), Seq("shk"), "left")
      .groupBy(window(col("ts"), windowLen), col("doc_id"))
      .agg(first(col("n_shingles")).as("n_shingles"), count(col("hit")).as("n_hit"))
      .withColumn("contam_frac",
        round(col("n_hit").cast("double") / col("n_shingles").cast("double"), 4) + 0.0)
      .withColumn("contaminated",
        (col("contam_frac") >= ContaminationFrac).cast("int"))
      .select(col("doc_id"), col("n_shingles"), col("n_hit"),
        col("contam_frac"), col("contaminated"))
  }

  /** DuckDB twin over the same shingle CTEs ([[Dedup.docShingleHashesSql]]). */
  val contaminationSql: String =
    s"""WITH ${Dedup.docShingleHashesSql.replace("\n", " ")},
       |bench AS (SELECT DISTINCT shk FROM shk WHERE doc_id % $BenchmarkMod = 0),
       |corpus AS (SELECT doc_id, shk FROM shk WHERE doc_id % $BenchmarkMod <> 0),
       |hits AS (
       |  SELECT doc_id, count(*) AS n_hit FROM corpus
       |  WHERE shk IN (SELECT shk FROM bench) GROUP BY 1),
       |totals AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY 1)
       |SELECT t.doc_id, t.n_shingles, coalesce(h.n_hit, 0) AS n_hit,
       |  round(coalesce(h.n_hit, 0) * 1.0 / t.n_shingles, 4) + 0.0 AS contam_frac,
       |  CAST(round(coalesce(h.n_hit, 0) * 1.0 / t.n_shingles, 4) + 0.0 >= $ContaminationFrac AS INT)
       |    AS contaminated
       |FROM totals t LEFT JOIN hits h ON t.doc_id = h.doc_id""".stripMargin
}
