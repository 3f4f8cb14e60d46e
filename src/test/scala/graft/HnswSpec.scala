package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import ann.{Ann, Hnsw}

/** The HNSW family's sbt evidence (q312/q313 are rows-only under the
  * driver — construction is sequential, no SQL twin exists, so THESE
  * assertions plus the q313 recall audit are the correctness story):
  * determinism run-to-run, output shape, the beam contract (generous
  * ef on one shard ≡ brute force exactly), and measured recall above
  * the deck's IVF-PQ frontier. */
class HnswSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("level draw is deterministic, non-negative, and geometrically rare") {
    val lvls = (0L until 5000L).map(Hnsw.levelOf)
    assert(lvls == (0L until 5000L).map(Hnsw.levelOf), "pure function of id")
    assert(lvls.forall(l => l >= 0 && l <= 8))
    // geometric with mL = 1/ln(8): ~12.5% at level ≥1, ~1.6% at ≥2
    val p1 = lvls.count(_ >= 1).toDouble / lvls.size
    assert(p1 > 0.06 && p1 < 0.25, s"level≥1 fraction $p1 off geometric")
  }

  test("q312 output shape: k rows per query, dense ranks, no self-pairs") {
    val df = Hnsw.docAnnHnsw(spark, dir).cache()
    val perQuery = df.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rk").as("mx"))
    assert(perQuery.filter(col("n") =!= Ann.TopK || col("mx") =!= Ann.TopK).count() == 0)
    assert(df.filter(col("neighbor_id") === col("query_id")).count() == 0)
    assert(df.filter(col("cos") < -1.0 || col("cos") > 1.0).count() == 0)
  }

  test("two runs produce identical rows (graphs are deterministic)") {
    val a = Hnsw.docAnnHnsw(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val b = Hnsw.docAnnHnsw(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(a == b)
  }

  test("beam contract: one shard + exhaustive ef returns brute force exactly") {
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count().toInt
    val got = Hnsw.annHnsw(emb, efSearch = n, nShards = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Ann.annBrute(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("q313 recall at production parameters clears the IVF-PQ 0.80 frontier") {
    val row = Hnsw.docHnswRecall(spark, dir).collect()(0)
    val recall = row.getDouble(row.fieldIndex("recall"))
    assert(recall >= 0.8, s"recall $recall < 0.80")
    // r16 verdict #5: the WORST query is the registered floor now —
    // ef = 48 is the first frontier point whose tail clears 0.80
    val worst = row.getDouble(row.fieldIndex("recall_worst"))
    assert(worst >= 0.8, s"recall_worst $worst < 0.80")
  }

  test("external-query surface: arbitrary query frame, exhaustive ef ≡ brute per query") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count().toInt
    // queries NOT on the stride and NOT in the corpus id space: ids
    // 1000001/1000002 carrying two corpus vectors — self-exclusion must
    // not fire (no corpus vec_id matches), so top-1 is the vector itself
    val vecs = emb.orderBy("vec_id").limit(2)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    val queries = vecs.zipWithIndex
      .map { case ((_, v), i) => (1000001L + i, v.toSeq) }
      .toSeq.toDF("query_id", "qv")
    val got = Hnsw.annHnswQueries(emb, queries, efSearch = n, nShards = 1)
    val top1 = got.filter(col("rk") === 1).orderBy("query_id").collect()
    assert(top1.length == 2)
    top1.zip(vecs).foreach { case (r, (srcId, _)) =>
      assert(r.getLong(1) == srcId && r.getDouble(3) == 1.0,
        s"query of corpus vector $srcId: top-1 ${r.getLong(1)} cos ${r.getDouble(3)}")
    }
  }

  test("qBlocks > 1 returns exactly the qBlocks = 1 rows (parallelism is free)") {
    val emb = Tables.embeddings(spark, dir)
    val q = Hnsw.strideQueries(emb)
    val a = Hnsw.annHnswQueries(emb, q).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val b = Hnsw.annHnswQueries(emb, q, qBlocks = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(a == b)
  }

  test("persisted index: save → load → query ≡ inline build (fit-once/query-many)") {
    val emb = Tables.embeddings(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("hnswidx").toString + "/g"
    ann.IndexStore.saveShardGraphs(Hnsw.buildIndex(emb).toDF(), path)
    val idx = ann.IndexStore.loadShardGraphs(spark, path)
    val fromIdx = Hnsw.annHnswFromIndex(idx, Hnsw.strideQueries(emb)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val inline = Hnsw.docAnnHnsw(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(fromIdx == inline, "persisted-index candidates must be byte-identical")
    // and with query-block fan-out over the SAME persisted graphs
    val blocked = Hnsw.annHnswFromIndex(idx, Hnsw.strideQueries(emb), qBlocks = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(blocked == inline)
  }
}
