package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import ann.Ann

/** ANN invariants at sf0.001: brute-force shape, LSH candidate validity,
  * and LSH recall measured against the brute-force oracle. */
class AnnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("q24 brute ANN: exactly top-k rows per query, ranks dense, cos within [-1,1]") {
    val df = ann.Ann.annBrute(spark, dir).cache()
    val perQuery = df.groupBy("query_id").agg(count(lit(1)).as("n"), max("rk").as("mx"))
    assert(perQuery.filter(col("n") =!= Ann.TopK || col("mx") =!= Ann.TopK).count() == 0)
    assert(df.filter(col("cos") < -1.0 || col("cos") > 1.0).count() == 0)
    assert(df.filter(col("neighbor_id") === col("query_id")).count() == 0)
  }

  test("q24 brute ANN: rank order agrees with cosine order") {
    val df = ann.Ann.annBrute(spark, dir)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("rk"))
    val bad = df.withColumn("prev_cos", lag("cos", 1).over(w))
      .filter(col("prev_cos").isNotNull && col("cos") > col("prev_cos"))
    assert(bad.count() == 0)
  }

  test("q25 LSH ANN: subset-of-corpus candidates, k rows max, positive recall") {
    val lsh = ann.Ann.annLsh(spark, dir).cache()
    val brute = ann.Ann.annBrute(spark, dir).cache()
    val perQuery = lsh.groupBy("query_id").agg(count(lit(1)).as("n"))
    assert(perQuery.filter(col("n") > Ann.TopK).count() == 0)
    // recall@k vs brute force: with 3 tables x 4 planes on weakly-
    // structured synthetic vectors expect well above random (k/n ~ 1%)
    val hits = lsh.join(brute, Seq("query_id", "neighbor_id"), "inner").count()
    val recall = hits.toDouble / brute.count()
    info(f"LSH recall@${Ann.TopK} = $recall%.3f")
    assert(recall >= 0.2, s"recall $recall below floor")
  }

  test("IVF ANN: k rows max per query, recall comparable to LSH") {
    val ivf = ann.Ann.annIvf(spark, dir).cache()
    val brute = ann.Ann.annBrute(spark, dir).cache()
    assert(ivf.groupBy("query_id").count().filter(col("count") > Ann.TopK).count() == 0)
    val hits = ivf.join(brute, Seq("query_id", "neighbor_id"), "inner").count()
    val recall = hits.toDouble / brute.count()
    info(f"IVF recall@${Ann.TopK} = $recall%.3f (probing ${Ann.IvfProbes}/${Ann.IvfCells} cells)")
    assert(recall >= 0.2, s"recall $recall below floor")
  }

  test("IVF ANN: centroid-param path is collect-free and matches the registered fit+query") {
    val emb = Tables.embeddings(spark, dir)
    val cents = Ann.fitCentroids(emb)
    assert(cents.length == Ann.IvfCells)
    assert(cents.map(_._1) == (0 until Ann.IvfCells))
    val viaParam = Ann.annIvf(emb, cents).cache()
    val registered = Ann.annIvf(spark, dir)
    assert(viaParam.except(registered).count() == 0)
    assert(registered.except(viaParam).count() == 0)
    // collect-freedom, tested for real: build the query over an input
    // that THROWS if any row is ever evaluated. Plan construction must
    // succeed (a driver-side collect inside annIvf — the regression this
    // guards — would evaluate rows right here and blow up).
    val poisoned = emb.where(assert_true(lit(false)).isNull)
    intercept[Exception] { poisoned.head() } // the poison is live
    Ann.annIvf(poisoned, cents) // must not throw: no action at build time
  }

  test("external-query surface: a foreign-id copy of a corpus vector finds itself at rk 1") {
    // the r16 "missing #1" overloads: every family accepts a
    // (query_id, qv) frame. Query with an id OUTSIDE the corpus id
    // space carrying corpus vector 0's embedding — self-exclusion must
    // not fire, so each path's top-1 is vector 0 at cos 1.0.
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val v0 = emb.orderBy("vec_id").limit(1)
      .select(col("embedding").cast("array<double>"))
      .as[Array[Double]].head()
    val q = Seq((900001L, v0.toSeq)).toDF("query_id", "qv")
    val cents = Ann.fitCentroids(emb)
    val idx = ann.IvfPq.fit(emb)
    val paths = Map(
      "brute" -> Ann.annBruteQueries(emb, q),
      "lsh" -> Ann.annLshQueries(emb, q),
      "ivf" -> Ann.annIvfQueries(emb, cents, q),
      "ivfadc" -> ann.IvfPq.annIvfAdcQueries(emb, idx, q))
    paths.foreach { case (name, df) =>
      val top = df.filter(col("rk") === 1).head()
      assert(top.getLong(0) == 900001L && top.getLong(1) == 0L &&
        top.getDouble(3) == 1.0,
        s"$name: top-1 ${top.getLong(1)} cos ${top.getDouble(3)}")
    }
  }

  test("q23 embed near-dup: pairs share a bucket and clear the cosine floor") {
    val df = ann.Ann.embedNearDup(spark, dir).cache()
    assert(df.filter(col("cos") < Ann.NearDupCos).count() == 0)
    assert(df.filter(col("vec_a") >= col("vec_b")).count() == 0)
  }

  test("q45 kmeans: every vector sits in its best-cosine cluster (Lloyd optimality)") {
    val emb = Tables.embeddings(spark, dir)
    val cent = ann.Kmeans.fit(emb)
    assert(cent.size == ann.Kmeans.K)
    val out = ann.Kmeans.kmeansClusters(spark, dir).cache()
    assert(out.count() == emb.count())
    // cluster_size column agrees with the actual group cardinality
    assert(out.groupBy("cluster", "cluster_size").agg(count(lit(1)).as("n"))
      .filter(col("n") =!= col("cluster_size")).count() == 0)
    // recompute all 8 cosines per vector and confirm the assigned
    // cluster is the argmax (ties toward higher cell, as registered)
    val v = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cosCols = cent.map { case (cid, cv) =>
      graft.functions.VectorMath.cosine(col("v"), typedLit(cv)).as(s"c$cid")
    }
    val joined = v.select(col("vec_id") +: cosCols: _*)
      .join(out.select("vec_id", "cluster"), "vec_id")
    val bad = joined.filter {
      val assigned = coalesce((0 until ann.Kmeans.K)
        .map(c => when(col("cluster") === c, col(s"c$c"))): _*)
      (0 until ann.Kmeans.K).map(c =>
        col(s"c$c") > assigned + lit(1e-9)).reduce(_ || _)
    }
    assert(bad.count() == 0, "some vector has a strictly better cluster")
    // clusters are non-trivial: more than one cluster in use
    assert(out.select("cluster").distinct().count() > 1)
  }

  test("q56 semdedup: greedy-by-id pruning invariants") {
    val out = ann.Kmeans.semDedup(spark, dir).cache()
    val emb = Tables.embeddings(spark, dir)
    assert(out.count() == emb.count())
    // both classes exercised
    assert(out.filter(col("keep") === 1).count() > 0)
    assert(out.filter(col("keep") === 0).count() > 0)
    // keep <-> no dup_of; canonical precedes the duplicate
    assert(out.filter((col("keep") === 1) =!= col("dup_of").isNull).count() == 0)
    assert(out.filter(col("dup_of") >= col("vec_id")).count() == 0)
    // dup_of stays within the duplicate's own cluster
    val byId = out.select(col("vec_id").as("o_id"), col("cluster").as("o_cluster"))
    assert(out.filter(col("dup_of").isNotNull)
      .join(byId, col("dup_of") === col("o_id"))
      .filter(col("cluster") =!= col("o_cluster")).count() == 0)
    // the min vec_id of every cluster has no smaller neighbor: kept
    assert(out.groupBy("cluster").agg(min("vec_id").as("m"))
      .join(out, col("m") === col("vec_id"))
      .filter(col("keep") === 0).count() == 0)
    // every duplicate's cosine to its canonical clears the threshold
    val v = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = out.filter(col("dup_of").isNotNull)
      .join(v.select(col("vec_id"), col("v").as("va")), "vec_id")
      .join(v.select(col("vec_id").as("dup_of"), col("v").as("vb")), "dup_of")
    assert(pairs.filter(
      graft.functions.VectorMath.cosine(col("va"), col("vb")) < ann.Kmeans.SemDedupCos)
      .count() == 0)
    out.unpersist()
  }

  test("q56 semdedup: k and iters parameters reach the fit") {
    // k=1 collapses the fit to a single cluster, turning the prune into
    // the all-pairs comparison the scaladoc's scale control is about —
    // the documented k ≈ n/targetCluster knob must be reachable
    val one = ann.Kmeans.semDedup(spark, dir, k = 1, iters = 1).cache()
    assert(one.select("cluster").distinct().count() == 1)
    // invariants hold in the degenerate geometry too
    assert(one.filter((col("keep") === 1) =!= col("dup_of").isNull).count() == 0)
    assert(one.filter(col("dup_of") >= col("vec_id")).count() == 0)
    // global min id has no smaller neighbor anywhere: always kept
    assert(one.orderBy("vec_id").limit(1).head.getAs[Int]("keep") == 1)
    // a tighter threshold can only shrink the duplicate set
    val strict = ann.Kmeans.semDedup(spark, dir, k = 1, iters = 1, cosT = 0.9)
    assert(strict.filter(col("keep") === 0).count()
      <= one.filter(col("keep") === 0).count())
    one.unpersist()
  }
}
