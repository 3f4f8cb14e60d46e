package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorMath

/** LEARNED-rotation OPQ audit (r15 verdict #6): the registered q265
  * keeps the hash-gate-compatible structured Hadamard rotation, and
  * the q266 audit measured its verdict on the REAL corpus ("measure
  * before enabling"). But that corpus is close to isotropic — the case
  * a learned rotation EXISTS for is anisotropic, cross-block-
  * correlated data. This module builds exactly that fixture and tests
  * all three family members on it:
  *
  *  - FIXTURE: x = H·D·(s ⊙ v)/√d over the real embeddings, with
  *    s_j = 2^(−j/8) — a sharply decaying spectrum (effective
  *    dimensionality ≈ 16 of 64) whose principal directions the
  *    Hadamard mix deliberately smears ACROSS the M fixed PQ blocks;
  *    fixed-block PQ must spend code budget on correlated noise.
  *  - LEARNED R: parametric OPQ (Ge et al. CVPR 2013 §3, OPQ_P):
  *    driver-side 64×64 covariance (one treeAggregate over the
  *    corpus — bounded like every codebook collect), Breeze `eigSym`
  *    (Spark's own bundled LAPACK lineage), then the paper's
  *    EIGENVALUE-ALLOCATION: eigenvectors are dealt to the M blocks
  *    greedily so the per-block variance PRODUCTS balance (smallest
  *    log-product first), undoing the cross-block correlation PQ is
  *    blind to. The rotated coordinates feed q69's `annPqFrame`
  *    UNCHANGED — identical code budget (M, Ks, Rerank).
  *
  * WHY ROWS-ONLY (documented in SparkEntry): the rotation is solved
  * from an eigendecomposition — exactly the step the q265 scaladoc
  * records as non-re-derivable in exactness-grade SQL; this audit is
  * the priced companion that tests the trade on the case it exists
  * for, not a replacement for the hash-gated q265/q266 pair.
  * Determinism per platform: the fixture is a pure projection of
  * md5-pinned literals; the covariance is a fixed-order aggregate; the
  * sign of each eigenvector is canonicalized (largest-|component|
  * positive) so the allocation is stable.
  *
  * Scale: covariance = one d²-state aggregate over the corpus;
  * eigendecomposition is d×d on the driver (d = 64); everything
  * downstream is q69's bounded plan. */
object OpqLearned {

  val Dim: Int = Ann.Dim

  /** Decaying per-coordinate scale: 2^(−j/8). */
  val Spectrum: IndexedSeq[Double] = (0 until Dim).map(j => math.pow(2.0, -j / 8.0))

  /** The anisotropic fixture: scale coordinates by [[Spectrum]], then
    * smear across blocks with q265's structured rotation (H·D/√d). */
  def anisotropic(embeddings: DataFrame): DataFrame = {
    val scaled = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"),
        zip_with(col("v"), typedLit(Spectrum), (a, b) => a * b).as("embedding"))
    Opq.rotate(scaled)
  }

  /** Driver-side covariance of the embedding coordinates (uncentered
    * second moment is fine for rotation purposes on zero-mean-ish
    * synthetic data; the paper's allocation only needs the energy
    * split). One treeAggregate, d² state. */
  def covariance(embeddings: DataFrame): Array[Array[Double]] = {
    val d = Dim
    val rows = embeddings.select(col("embedding")).rdd
      .map(_.getSeq[Double](0).toArray)
    val (sums, n) = rows.treeAggregate((Array.ofDim[Double](d * d), 0L))(
      seqOp = { case ((acc, cnt), v) =>
        var i = 0
        while (i < d) {
          val vi = v(i); var j = 0
          while (j < d) { acc(i * d + j) += vi * v(j); j += 1 }
          i += 1
        }
        (acc, cnt + 1)
      },
      combOp = { case ((a, ca), (b, cb)) =>
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        (a, ca + cb)
      })
    Array.tabulate(d, d)((i, j) => sums(i * d + j) / math.max(1L, n))
  }

  /** Parametric-OPQ rotation rows from a covariance matrix: eigSym,
    * descending eigenvalues, sign-canonicalized eigenvectors, greedy
    * balanced allocation of eigenvectors to the M blocks by smallest
    * running log-variance-product. Returns the rows of R (row i =
    * direction of rotated coordinate i), blocks contiguous. */
  def eigenAllocationRows(cov: Array[Array[Double]],
      m: Int = Pq.M): IndexedSeq[IndexedSeq[Double]] = {
    val d = cov.length
    val es = breeze.linalg.eigSym(breeze.linalg.DenseMatrix.tabulate(d, d)((i, j) => cov(i)(j)))
    // breeze returns ascending eigenvalues; take descending
    val order = (0 until d).sortBy(i => -es.eigenvalues(i))
    val vecs = order.map { k =>
      val v = (0 until d).map(r => es.eigenvectors(r, k))
      // canonical sign: the largest-|component| coordinate positive
      val piv = v.indices.maxBy(i => math.abs(v(i)))
      if (v(piv) < 0) v.map(-_) else v
    }
    val lams = order.map(es.eigenvalues(_))
    val sub = d / m
    val logProd = Array.ofDim[Double](m)
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    for (k <- 0 until d) {
      // among blocks with free capacity, the smallest current product
      val b = (0 until m).filter(buckets(_).length < sub).minBy(logProd)
      buckets(b) += k
      logProd(b) += math.log(math.max(lams(k), 1e-12))
    }
    buckets.toIndexedSeq.flatMap(_.toIndexedSeq).map(vecs(_))
  }

  /** Rotate a frame by literal rotation rows (unit-norm eigvecs — no
    * scale divisor), keeping the (vec_id, embedding) schema. */
  def rotateBy(embeddings: DataFrame, rows: IndexedSeq[IndexedSeq[Double]]): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), array(rows.map { r =>
        VectorMath.dot(col("v"), typedLit(r))
      }: _*).as("embedding"))

  /** q319 — the three-family recall audit on the anisotropic fixture:
    * identity-block PQ vs blind Hadamard OPQ vs LEARNED parametric
    * OPQ, identical code budget, same brute truth (the q266 shape plus
    * one column). */
  def learnedRecall(embeddings: DataFrame): DataFrame = {
    val fix = anisotropic(embeddings).localCheckpoint(true)
    val truth = Ann.annBrute(fix)
      .select("query_id", "neighbor_id").localCheckpoint(true)
    def hits(returned: DataFrame, tag: String): DataFrame = {
      val perQuery = truth
        .join(returned.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id")
        .agg(expr("CAST(count(1) AS BIGINT)").as("n_hit_q"))
      truth.select("query_id").distinct()
        .join(perQuery, Seq("query_id"), "left")
        .selectExpr("coalesce(n_hit_q, CAST(0 AS BIGINT)) AS n_hit_q")
        .agg(expr("CAST(sum(n_hit_q) AS BIGINT)").as(s"hit_$tag"),
          expr("CAST(count(1) AS BIGINT)").as(s"nq_$tag"))
    }
    val rot = eigenAllocationRows(covariance(fix))
    val pq = hits(Pq.annPqFrame(fix), "pq")
    val had = hits(Pq.annPqFrame(Opq.rotate(fix).localCheckpoint(true)), "had")
    val lrn = hits(Pq.annPqFrame(rotateBy(fix, rot).localCheckpoint(true)), "lrn")
    truth.agg(expr("CAST(count(1) AS BIGINT)").as("n_truth"))
      .crossJoin(pq).crossJoin(had).crossJoin(lrn)
      .selectExpr("nq_pq AS n_queries", s"CAST(${Ann.TopK} AS INT) AS k",
        "n_truth",
        "round(CAST(hit_pq AS DOUBLE)" +
          " / nullif(CAST(n_truth AS DOUBLE), 0e0), 6) + 0.0 AS recall_pq",
        "round(CAST(hit_had AS DOUBLE)" +
          " / nullif(CAST(n_truth AS DOUBLE), 0e0), 6) + 0.0 AS recall_hadamard",
        "round(CAST(hit_lrn AS DOUBLE)" +
          " / nullif(CAST(n_truth AS DOUBLE), 0e0), 6) + 0.0 AS recall_learned")
  }

  def docLearnedRecall(spark: SparkSession, dir: String): DataFrame =
    learnedRecall(Tables.embeddings(spark, dir))
}
