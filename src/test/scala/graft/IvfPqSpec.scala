package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import ann.{Ann, IndexStore, IvfPq, Pq}

/** IVFADC invariants (r10 verdict #6). Value-level equivalence vs the
  * CTE DuckDB twin runs through graft.Verify + tools/verify_local.py
  * (q145); here: fit determinism, residual identity, persistence
  * round-trip, and the recall-vs-IVF contract at equal probe budget. */
class IvfPqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("fit is deterministic; codebooks live in the residual space") {
    val emb = Tables.embeddings(spark, dir)
    val a = IvfPq.fit(emb)
    val b = IvfPq.fit(emb)
    assert(a == b)
    assert(a.centroids.size == Ann.IvfCells)
    assert(a.books.size == Pq.M * Pq.Ks)
    assert(a.books.forall(_._3.size == Pq.SubDim))
    // residual-space codebooks are centered: entries are small relative
    // to the raw-space codebooks (the point of residual encoding)
    val rawNorm = Pq.fit(emb).map(b0 => math.sqrt(
      b0._3.map(x => x * x).sum)).max
    val resNorm = a.books.map(b0 => math.sqrt(
      b0._3.map(x => x * x).sum)).max
    assert(resNorm < rawNorm,
      s"residual codebooks ($resNorm) should be tighter than raw ($rawNorm)")
  }

  test("residuals reconstruct: v = c(cell) + r, elementwise exact") {
    val emb = Tables.embeddings(spark, dir)
    val cents = Ann.fitCentroids(emb)
    val centMap = cents.toMap
    IvfPq.residuals(emb, cents)
      .join(emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")), "vec_id")
      .collect().foreach { r =>
        val cell = r.getInt(r.fieldIndex("cell"))
        val rv = r.getSeq[Double](r.fieldIndex("embedding"))
        val v = r.getSeq[Double](r.fieldIndex("v"))
        val c = centMap(cell)
        v.indices.foreach { i =>
          assert(v(i) - c(i) == rv(i), s"vec ${r.getLong(0)} dim $i")
        }
      }
  }

  test("index persists through IndexStore and reloads byte-identical") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val emb = Tables.embeddings(spark, dir)
    val idx = IvfPq.fit(emb)
    IndexStore.saveCentroids(spark, idx.centroids, s"$tmp/cent")
    IndexStore.saveCodebooks(spark, idx.books, s"$tmp/books")
    val idx2 = IvfPq.Index(
      IndexStore.loadCentroids(spark, s"$tmp/cent"),
      IndexStore.loadCodebooks(spark, s"$tmp/books"))
    assert(idx2 == idx)
    // and the reloaded index produces the identical top-k
    val a = IvfPq.annIvfAdc(emb, idx).collect().map(_.toSeq).sortBy(_.toString)
    val b = IvfPq.annIvfAdc(emb, idx2).collect().map(_.toSeq).sortBy(_.toString)
    assert(a.sameElements(b))
  }

  test("shape: TopK rows per query, cosines in range") {
    val out = IvfPq.annIvfPq(spark, dir).cache()
    val perQuery = out.groupBy("query_id").count()
    assert(perQuery.filter(col("count") =!= Ann.TopK).count() == 0)
    assert(out.filter(col("cos") > 1.0001 || col("cos") < -1.0001).count() == 0)
    out.unpersist()
  }

  test("ADC decomposition equals the direct cosine of the reconstruction") {
    val emb = Tables.embeddings(spark, dir)
    val idx = IvfPq.fit(emb)
    val cents = idx.centroids.sortBy(_._1).map(_._2)
    def book(m: Int) = idx.books.collect { case (`m`, cid, cv) => (cid, cv) }
      .sortBy(_._1).map(_._2)
    def dotD(a: Seq[Double], b: Seq[Double]) =
      a.indices.map(i => a(i) * b(i)).sum
    val vecs = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val q = vecs(0L)
    val qn = math.sqrt(dotD(q, q))
    IvfPq.encode(emb, idx).collect().take(60).foreach { row =>
      val cell = row.getInt(1)
      val codes = (0 until Pq.M).map(m => row.getInt(2 + m))
      val recon = (0 until Ann.Dim).map { i =>
        cents(cell)(i) + book(i / Pq.SubDim)(codes(i / Pq.SubDim))(i % Pq.SubDim)
      }
      val direct = dotD(q, recon) / (qn * math.sqrt(dotD(recon, recon)))
      // the ADC lookup formula, as the plan computes it
      val t = (0 until Pq.M).map(m => dotD(
        q.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim), book(m)(codes(m))))
      val cc = (0 until Pq.M).map(m => dotD(
        cents(cell).slice(m * Pq.SubDim, (m + 1) * Pq.SubDim), book(m)(codes(m))))
      val bn = (0 until Pq.M).map(m => dotD(book(m)(codes(m)), book(m)(codes(m))))
      val adc = (dotD(q, cents(cell)) + t.sum) /
        (qn * math.sqrt(dotD(cents(cell), cents(cell)) + 2.0 * cc.sum + bn.sum))
      assert(math.abs(direct - adc) < 1e-9,
        s"vec ${row.getLong(0)}: direct $direct vs adc $adc")
    }
  }

  test("recall@5 ≥ IVF-alone at the same probe budget (the verdict contract)") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Ann.annBrute(spark, dir))
    val emb = Tables.embeddings(spark, dir)
    val ivf = pairs(Ann.annIvf(emb, Ann.fitCentroids(emb)))
    val ivfpq = pairs(IvfPq.annIvfPq(spark, dir))
    val rIvf = (ivf intersect brute).size.toDouble / brute.size
    val rIvfPq = (ivfpq intersect brute).size.toDouble / brute.size
    // same probed cells; the Rerank-deep exact re-rank must not lose
    // candidates the plain-IVF exact ranking keeps
    assert(rIvfPq >= rIvf, s"IVFADC recall $rIvfPq < IVF recall $rIvf")
  }
}
