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

  test("q30: metadata stays in envelope (format known, dims in [64, 319])") {
    val df = Multimodal.multimodalMeta(spark, dir).cache()
    assert(df.filter(!col("format").isin(Multimodal.Formats.map(lit(_)): _*)).count() == 0)
    assert(df.filter(col("width") < 64 || col("width") > 319
      || col("height") < 64 || col("height") > 319).count() == 0)
  }
}
