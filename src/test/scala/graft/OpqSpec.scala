package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import ann.{Ann, Opq}

/** OPQ structured rotation (q265/q266): orthonormality of the H·D
  * sign matrix, exact norm/dot preservation through the projection,
  * rotation-invariance of the brute top-k ranking, and the registered
  * shapes. Value-level oracle equivalence runs through graft.Verify. */
class OpqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  test("sign matrix rows are orthogonal with norm² = 64") {
    for (i <- 0 until 8; j <- 0 until 8) {
      val d = Opq.signRow(i * 7).zip(Opq.signRow(j * 7))
        .map { case (a, b) => a * b }.sum
      if (i == j) assert(d == 64.0) else assert(d == 0.0)
    }
    // full check on a coarser grid incl. the last row
    val last = Opq.signRow(63).zip(Opq.signRow(0))
      .map { case (a, b) => a * b }.sum
    assert(last == 0.0)
  }

  test("rotation preserves norms and pairwise dots (orthonormal map)") {
    import spark.implicits._
    val vecs = (0 until 6).map { i =>
      (i.toLong, (0 until 64).map(j =>
        math.sin(i * 64 + j + 1.0)).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val rot = Opq.rotate(df).as[(Long, Seq[Double])].collect()
      .sortBy(_._1).map(_._2)
    val orig = vecs.map(_._2.toSeq)
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    for (i <- orig.indices; j <- i until orig.size) {
      assert(math.abs(dot(rot(i), rot(j)) - dot(orig(i), orig(j))) < 1e-9)
    }
  }

  test("brute top-k in rotated space equals top-k in original space") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .localCheckpoint(true)
    val a = Ann.annBrute(emb)
      .selectExpr("query_id", "neighbor_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = Ann.annBrute(Opq.rotate(emb))
      .selectExpr("query_id", "neighbor_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a == b)
  }

  test("registered q265 shape matches q69's contract") {
    val df = Opq.annOpq(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq == Seq("query_id", "neighbor_id", "rk", "cos"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(2)).max <= Ann.TopK)
  }

  test("q266 audit: one row, both recalls in [0, 1], worst <= recall") {
    val r = Opq.docOpqRecall(spark, "/root/testdata/sf0.001").collect()
    assert(r.length == 1)
    val row = r.head
    val rp = row.getDouble(row.fieldIndex("recall_pq"))
    val ro = row.getDouble(row.fieldIndex("recall_opq"))
    assert(rp >= 0.0 && rp <= 1.0 && ro >= 0.0 && ro <= 1.0)
    assert(row.getDouble(row.fieldIndex("worst_pq")) <= rp + 1e-9)
    assert(row.getDouble(row.fieldIndex("worst_opq")) <= ro + 1e-9)
  }
}
