package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Chunking

/** Context-window preparation invariants: chunks tile each document
  * exactly; packed spans tile each shard stream exactly. */
class ChunkingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("q57: chunks tile the document — first at token 1, last reaches n, stride spacing") {
    val docs = Tables.documents(spark, dir)
    val chunks = Chunking.chunk(docs).cache()
    val n = docs.select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
    val agg = chunks.groupBy("doc_id").agg(
      min("start_tok").as("first_start"), max("end_tok").as("last_end"),
      count(lit(1)).as("k"), max("chunk_id").as("max_id"))
      .join(n, "doc_id")
    assert(agg.filter(col("first_start") =!= 1).count() == 0)
    assert(agg.filter(col("last_end") =!= col("n_tok")).count() == 0)
    assert(agg.filter(col("max_id") =!= col("k") - 1).count() == 0)
    // consecutive chunks start exactly stride apart
    val w = Window.partitionBy(col("doc_id")).orderBy(col("chunk_id"))
    val gaps = chunks.withColumn("prev_start", lag(col("start_tok"), 1).over(w))
      .filter(col("prev_start").isNotNull)
      .filter(col("start_tok") - col("prev_start") =!= Chunking.ChunkStride)
    assert(gaps.count() == 0)
    // chunk_text really holds chunk_tokens whitespace tokens
    assert(chunks.filter(size(split(col("chunk_text"), " ")) =!= col("chunk_tokens"))
      .count() == 0)
    // overlap exists: some documents produce >1 chunk
    assert(agg.filter(col("k") > 1).count() > 0)
    chunks.unpersist()
  }

  test("q57: short document yields exactly one whole-document chunk") {
    val one = Seq((1L, "only five tokens right here")).toDF("doc_id", "text")
    val c = Chunking.chunk(one).collect()
    assert(c.length == 1)
    val r = c.head
    assert(r.getLong(r.fieldIndex("start_tok")) == 1 &&
      r.getLong(r.fieldIndex("end_tok")) == 5)
    assert(r.getString(r.fieldIndex("chunk_text")) == "only five tokens right here")
  }

  test("q58: spans tile each shard stream; sequence ranges consistent") {
    val packed = Chunking.pack(spark, dir).cache()
    // starts follow ends contiguously within each shard
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    val bad = packed.withColumn("prev_end", lag(col("end_off"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("start_off") =!= col("prev_end"))
    assert(bad.count() == 0)
    // first doc of each shard starts at 0
    assert(packed.groupBy("shard").agg(min("start_off").as("m"))
      .filter(col("m") =!= 0).count() == 0)
    // seq bounds: floor division of the span, never inverted
    assert(packed.filter(col("seq_first") =!= floor(col("start_off") / Chunking.PackCapacity))
      .count() == 0)
    assert(packed.filter(col("seq_last") < col("seq_first")).count() == 0)
    assert(packed.filter(col("n_seqs") =!= col("seq_last") - col("seq_first") + 1)
      .count() == 0)
    // boundary-straddling documents exist and are the only multi-seq ones
    val multi = packed.filter(col("n_seqs") > 1)
    assert(multi.count() > 0)
    assert(multi.filter(
      floor((col("end_off") - 1) / Chunking.PackCapacity) === floor(col("start_off") / Chunking.PackCapacity))
      .count() == 0)
    packed.unpersist()
  }

  test("q276: utilization and crossing rate match hand arithmetic per shard") {
    val util = Chunking.packUtilization(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val packed = Chunking.pack(spark, dir).collect()
    assert(util.nonEmpty)
    packed.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
      val r = util(shard)
      val t = rows.map(_.getLong(4)).max // max end_off
      val nSeqs = (t - 1) / Chunking.PackCapacity + 1
      val crossing = rows.count(_.getLong(7) > 1)
      assert(r.getLong(r.fieldIndex("n_docs")) == rows.length.toLong)
      assert(r.getLong(r.fieldIndex("total_tokens")) == t)
      assert(r.getLong(r.fieldIndex("n_seqs")) == nSeqs)
      assert(r.getLong(r.fieldIndex("n_crossing")) == crossing.toLong)
      val u = r.getDouble(r.fieldIndex("utilization"))
      assert(math.abs(u - t.toDouble / (nSeqs * Chunking.PackCapacity)) < 1e-5)
      assert(u > 0.0 && u <= 1.0)
    }
  }
}
