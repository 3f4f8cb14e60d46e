package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import dedup.{Components, Dedup}

/** Connected-components invariants. Value-level equivalence vs DuckDB's
  * recursive CTE runs through graft.Verify + tools/verify_local.py. */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("path graph: a 64-node chain collapses to one cluster (pointer jumping)") {
    // worst case for plain neighbor propagation (diameter 63); pointer
    // jumping must converge well inside the 50-round cap
    import spark.implicits._
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val nodes = (0L until 64L).toDF("doc_id")
    val out = Components.connectedComponents(edges, nodes).cache()
    assert(out.count() == 64)
    assert(out.select("cluster_id").distinct().count() == 1)
    assert(out.agg(min("cluster_id")).head.getLong(0) == 0L)
    assert(out.agg(max("cluster_size")).head.getLong(0) == 64L)
  }

  test("disjoint components and singletons keep separate min-id labels") {
    import spark.implicits._
    // {1,2,3} triangle, {10,11} pair, {99} isolated
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("doc_id")
    val got = Components.connectedComponents(edges, nodes)
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L), (99L, 99L, 1L)))
  }

  test("q42 contamination: planted benchmark copy is flagged, disjoint doc is not") {
    import spark.implicits._
    val docs = Seq(
      (20L, "the quick brown fox jumps over the lazy dog"), // benchmark (id%20==0)
      (1L, "the quick brown fox jumps over the lazy dog"),  // exact copy -> frac 1.0
      (2L, "completely different words nothing shared here at all"), // 0 overlap
      (3L, "the quick brown fox and then something else entirely"))  // partial
      .toDF("doc_id", "text")
    val got = dedup.Contamination.contamination(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getInt(4)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L)) // benchmark doc excluded
    assert(got(0) == ((1L, 1.0, 1)))
    assert(got(1) == ((2L, 0.0, 0)))
    assert(got(2)._2 > 0.0 && got(2)._2 < 1.0)
  }

  test("q46 incremental dedup: exact beats near, disjoint batch doc is new") {
    import spark.implicits._
    val docs = Seq(
      // corpus
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally unrelated corpus content sits right here now"),
      // batch (%10==0): 10 = exact copy of 1; 20 = near-dup of 1
      // (one word changed); 30 = brand new
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (20L, "alpha beta gamma delta epsilon zeta eta iota"),
      (30L, "nothing in common with anything stored so far truly"))
      .toDF("doc_id", "text")
    val got = dedup.Incremental.incrementalDedup(docs)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set((10L, "exact", 1L), (20L, "near", 1L), (30L, "new", -1L)))
  }

  test("reliable checkpoint mode is result-identical to localCheckpoint") {
    import spark.implicits._
    // 64-node chain + a disjoint triangle + singletons: exercises
    // multi-round convergence under both lineage-truncation modes
    val edges = ((0L until 63L).map(i => (i, i + 1)) ++ Seq((100L, 101L), (101L, 102L), (100L, 102L)))
      .toDF("doc_a", "doc_b")
    val nodes = ((0L to 63L) ++ (100L to 102L) ++ Seq(200L)).toDF("doc_id")
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ck").toString
    val local = Components.connectedComponents(edges, nodes)
      .select("doc_id", "cluster_id", "cluster_size").collect().map(_.toSeq).toSet
    val reliable = Components.connectedComponents(edges, nodes,
      checkpointDir = Some(ckDir))
      .select("doc_id", "cluster_id", "cluster_size").collect().map(_.toSeq).toSet
    assert(local == reliable)
    assert(reliable.exists(_(1) == 0L) && reliable.exists(_(1) == 100L))
  }

  test("two checkpointed calls sharing one dir do not clobber each other") {
    import spark.implicits._
    // A's result frame lazily reads its checkpoint files; running B
    // into the SAME dir before A is consumed must not overwrite them
    // (per-invocation cc-<uuid> namespace)
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ck-shared").toString
    val a = Components.connectedComponents(
      Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b"),
      Seq(1L, 2L, 3L).toDF("doc_id"), checkpointDir = Some(ckDir))
    val b = Components.connectedComponents(
      Seq((10L, 11L)).toDF("doc_a", "doc_b"),
      Seq(10L, 11L, 12L).toDF("doc_id"), checkpointDir = Some(ckDir))
    // consume B first, then A: with deterministic labels-N paths A
    // would now read B's (smaller) graph
    val gotB = b.select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    val gotA = a.select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    assert(gotB == Set((10L, 10L, 2L), (11L, 10L, 2L), (12L, 12L, 1L)))
    assert(gotA == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L)))
  }

  test("checkpointed variant exposes its namespace for caller cleanup") {
    import spark.implicits._
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ck-ns").toString
    val (df, ns) = Components.connectedComponentsCheckpointed(
      Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b"),
      Seq(1L, 2L, 3L).toDF("doc_id"), ckDir)
    assert(ns.startsWith(s"$ckDir/cc-"))
    val got = df.select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L)))
    // only the final-round parquet remains (older rounds pruned in-loop)
    val nsPath = new org.apache.hadoop.fs.Path(ns)
    val fs = nsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(nsPath))
    assert(fs.listStatus(nsPath).length <= 2, "more than two rounds retained")
    // contract: consumed => deletable; the shared dir then holds nothing
    fs.delete(nsPath, true)
    assert(!fs.exists(nsPath))
  }

  test("validateEdges rejects endpoints outside the node universe") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 999L)).toDF("doc_a", "doc_b")
    val nodes = Seq(1L, 2L, 3L).toDF("doc_id")
    val ex = intercept[IllegalArgumentException] {
      Components.connectedComponents(edges, nodes, validateEdges = true)
    }
    assert(ex.getMessage.contains("999"))
    // without validation the stray id is adopted (documented semantics)
    val adopted = Components.connectedComponents(edges, nodes)
    assert(adopted.filter(col("doc_id") === 999L).count() == 1)
  }

  test("q39 on sf0.001 matches a driver-side transitive closure of the same pairs") {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.dedupMinhash(docs)
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
      .collect()
    val ids = docs.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    // brute union-find on the driver as the oracle for the distributed run
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = ids.map(i => i -> find(i)).toMap
    val got = Components.dedupCluster(spark, dir)
      .select("doc_id", "cluster_id")
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
      .collect().toMap
    assert(got == expected)
  }
}
