package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import multimodal.Multimodal

/** Multimodal plumbing: the typed mapPartitions decode path must agree
  * exactly with the declarative (oracle-checked) twin. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("q30: mapPartitions decode == declarative metadata query, row for row") {
    val typed = Multimodal.decodePayload(Multimodal.payloads(spark, dir)).toDF()
    val declarative = Multimodal.multimodalMeta(spark, dir)
    assert(typed.count() == declarative.count())
    val diff = typed.join(declarative,
      Seq("doc_id", "payload_len", "format", "width", "height"), "left_anti")
    assert(diff.count() == 0, "decode paths disagree")
  }

  test("q30: payloads are binary, 16 bytes, deterministic") {
    val df = Multimodal.payloads(spark, dir).cache()
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.filter(length(col("payload")) =!= 16).count() == 0)
  }

  test("feature extraction: fixed-dim embeddings, deterministic, ANN-consumable") {
    val payloads = Multimodal.payloads(spark, dir)
    val feats = Multimodal.extractFeatures(payloads).toDF().cache()
    assert(feats.count() == payloads.count())
    assert(feats.filter(size(col("embedding")) =!= Multimodal.FeatureDim).count() == 0)
    // deterministic: extracting twice gives identical embeddings
    val again = Multimodal.extractFeatures(payloads).toDF()
      .withColumnRenamed("embedding", "emb2")
    val joined = feats.join(again, "doc_id")
      .filter(col("embedding") =!= col("emb2"))
    assert(joined.count() == 0)
    // composes with the ANN module (vec_id/embedding schema) end-to-end
    val asVecs = feats.select(col("doc_id").as("vec_id"), col("embedding"))
    val nd = ann.Ann.embedNearDup(asVecs, dim = Multimodal.FeatureDim).cache()
    assert(nd.columns.sameElements(Array("vec_a", "vec_b", "cos")))
    assert(nd.filter(col("cos") < ann.Ann.NearDupCos).count() == 0)
  }

  test("resize and frame sampling: row shapes and fan-out") {
    val payloads = Multimodal.payloads(spark, dir)
    val n = payloads.count()
    val resized = Multimodal.resize(payloads, 128, 96).toDF()
    assert(resized.count() == n)
    assert(resized.filter(col("width") =!= 128 || col("height") =!= 96).count() == 0)
    val frames = Multimodal.sampleFrames(payloads, 3).toDF()
    assert(frames.count() == 3 * n)
    assert(frames.groupBy("doc_id").count().filter(col("count") =!= 3).count() == 0)
  }

  test("q30: metadata stays in envelope (format known, dims in [64, 319])") {
    val df = Multimodal.multimodalMeta(spark, dir).cache()
    assert(df.filter(!col("format").isin(Multimodal.Formats.map(lit(_)): _*)).count() == 0)
    assert(df.filter(col("width") < 64 || col("width") > 319
      || col("height") < 64 || col("height") > 319).count() == 0)
  }
}
