package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.{Chunking, Pipeline, WeightedSample}
import textstats.Curation

/** q162: the exact-size ES-mixture pipeline variant — composition
  * parity against a naive window-ranked recomposition, the per-lang
  * quota law, and the q142 plan invariants (one corpus scan, no
  * shuffled join, banded pack windows). */
class PipelineEsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  /** Spec-local copy of the ES key chain (pins the contract). */
  private def withEs(df: DataFrame): DataFrame = df
    .withColumn("h", graft.functions.Hashing.hash48(
      WeightedSample.Seed, col("doc_id").cast("string")))
    .withColumn("es", expr(
      "CAST(floor(ln((CAST(h AS DOUBLE) + 1.0) / 281474976710656.0)" +
        " * 1e9 + 5e-1) AS DOUBLE) / 1e9 / CAST(n_tok AS DOUBLE)"))

  private def naiveKept(docs: DataFrame): DataFrame = {
    val keptIds = Curation.curate(docs).filter(col("keep") === 1)
      .select("doc_id", "quality_score")
    docs.join(keptIds, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"),
        col("quality_score"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
  }

  test("ES pipeline ≡ curate → quota'd ES window draw → pack composed naively") {
    val docs = Tables.documents(spark, dir)
    val kept = naiveKept(docs).cache()
    val quotaOf = Pipeline.EsQuotas.foldLeft(lit(0L)) { case (acc, (l, q)) =>
      when(col("lang") === l, lit(q)).otherwise(acc)
    }
    val sampled = withEs(kept)
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("es").desc, col("doc_id"))))
      .filter(col("rk") <= quotaOf)
      .withColumn("shard",
        pmod(col("doc_id"), lit(Chunking.PackShards)).cast("long"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = sampled
      .withColumn("start_off",
        coalesce(sum(col("n_tok")).over(w), lit(0L)).cast("long"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("quality_score"), col("shard"), col("n_tok"), col("start_off"),
        (col("start_off") + col("n_tok")).as("end_off"),
        floor(col("start_off") / Chunking.PackCapacity).as("seq_first"),
        floor((col("start_off") + col("n_tok") - 1) / Chunking.PackCapacity)
          .as("seq_last"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val got = Pipeline.trainingPipelineEs(spark, dir)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got.nonEmpty, "ES pipeline must keep documents at sf0.001")
    assert(got == want)
    kept.unpersist()
  }

  test("per-lang sizes = min(quota, curated pool); no repeats") {
    val out = Pipeline.trainingPipelineEs(spark, dir).cache()
    val pool = naiveKept(Tables.documents(spark, dir))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = out.groupBy("lang").agg(
      count(lit(1)).as("n"), countDistinct("doc_id").as("nd")).collect()
    got.foreach { r =>
      val lang = r.getString(0)
      val quota = Pipeline.EsQuotas.toMap.getOrElse(lang, 0L)
      assert(r.getLong(1) == math.min(quota, pool.getOrElse(lang, 0L)),
        s"lang=$lang")
      assert(r.getLong(1) == r.getLong(2), s"repeat in lang=$lang")
    }
    out.unpersist()
  }

  test("plan: one corpus materialization; no shuffled join; banded windows") {
    spark.sharedState.cacheManager.clearCache()
    val df = Pipeline.trainingPipelineEs(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("FileScan") && !p.contains("Scan parquet"),
      "post-checkpoint plan must not rescan the corpus")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the winner set is dimension-grade and must broadcast back")
    assert(!p.contains("CartesianProduct"))
    val bandless = p.linesIterator.filter(_.contains("- Window ["))
      .filterNot(_.contains("__band")).toSeq
    assert(bandless.isEmpty,
      s"pack offsets must run banded, got: ${bandless.mkString("; ")}")
  }
}
