package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import ann.{Ann, DiskAnn}

/** The DiskANN-style PQ-on-graph hybrid (q323/q324, rows-only — the
  * q312 sequential-build rationale): output shape, determinism, and
  * recall against brute truth at the measured ef frontier. */
class DiskAnnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("q323 output shape: k rows per query, dense ranks, no self-pairs") {
    val df = DiskAnn.docAnnDiskAnn(spark, dir).cache()
    val perQuery = df.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rk").as("mx"))
    assert(perQuery.filter(col("n") =!= Ann.TopK || col("mx") =!= Ann.TopK).count() == 0)
    assert(df.filter(col("neighbor_id") === col("query_id")).count() == 0)
  }

  test("two runs produce identical rows (codes + graphs deterministic)") {
    val a = DiskAnn.docAnnDiskAnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val b = DiskAnn.docAnnDiskAnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(a == b)
  }

  test("q324: the compressed walk clears the 0.80 frontier at ef = 96") {
    val row = DiskAnn.diskAnnRecall(Tables.embeddings(spark, dir)).collect()(0)
    val recall = row.getDouble(row.fieldIndex("recall_diskann"))
    assert(recall >= 0.8, s"recall $recall < 0.80")
  }

  test("persisted index + persisted codebooks: fully fit-free query ≡ inline") {
    import ann.{Hnsw, IndexStore, Pq}
    val emb = Tables.embeddings(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("diskannidx").toString
    IndexStore.saveShardGraphs(Hnsw.buildIndex(emb).toDF(), s"$tmp/g")
    IndexStore.saveCodebooks(spark, Pq.fit(emb), s"$tmp/cb")
    val idx = IndexStore.loadShardGraphs(spark, s"$tmp/g")
    val books = IndexStore.loadCodebooks(spark, s"$tmp/cb")
    val fromIdx = DiskAnn.annDiskAnnFromIndex(idx, emb,
        Hnsw.strideQueries(emb), books0 = books, qBlocks = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val inline = DiskAnn.docAnnDiskAnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(fromIdx == inline, "persisted-index DiskANN must match the inline path")
  }
}
