package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import ann.{Ann, Jl}
import graft.functions.Hyperplanes

/** JL projection invariants (q148). Value-level parity with the
  * plane-regenerating DuckDB twin runs through the oracle gate; here:
  * the distance-preservation property the operator exists for, the
  * norm calibration of the √(3/k) scale, and linearity. */
class JlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def dotD(a: Seq[Double], b: Seq[Double]) =
    a.indices.map(i => a(i) * b(i)).sum

  private def projectD(v: Seq[Double]): Seq[Double] =
    (0 until Jl.K).map(j => dotD(v, Hyperplanes.plane(j, Ann.Dim)) * Jl.Scale)

  lazy val vecs: Map[Long, Seq[Double]] = {
    import org.apache.spark.sql.functions._
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
  }

  test("SQL path equals the driver projection at the rounding grid") {
    val got = Jl.jlProject(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    vecs.take(30).foreach { case (id, v) =>
      val want = projectD(v)
      (0 until Jl.K).foreach { j =>
        val w = BigDecimal(want(j))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(got((id, j)) - w) <= 1e-4 + 1e-12,
          s"vec $id dim $j: ${got((id, j))} vs $w")
      }
    }
  }

  test("pairwise distances survive the 64 → 16 projection (the JL property)") {
    val ids = vecs.keys.toSeq.sorted.take(40)
    val ratios = for {
      i <- ids.indices; k <- (i + 1) until ids.length
    } yield {
      val (u, v) = (vecs(ids(i)), vecs(ids(k)))
      val d = u.indices.map(x => u(x) - v(x))
      val (pu, pv) = (projectD(u), projectD(v))
      val pd = pu.indices.map(x => pu(x) - pv(x))
      dotD(pd, pd) / dotD(d, d)
    }
    // k = 16 ⇒ per-pair std ≈ √(2/k) ≈ 0.35: individual ratios stay in
    // a wide band, the median sits near 1 (the calibration check)
    assert(ratios.forall(r => r > 0.15 && r < 3.5),
      s"extreme ratio: ${ratios.min} .. ${ratios.max}")
    val med = ratios.sorted.apply(ratios.size / 2)
    assert(med > 0.75 && med < 1.3, s"median ratio $med")
  }

  test("q151 JL-shortlist ANN: recall@5 vs brute clears the floor") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val jl = pairs(Jl.annJl(spark, dir))
    val brute = pairs(Ann.annBrute(spark, dir))
    val recall = (jl intersect brute).size.toDouble / brute.size
    // recall factors: P(true neighbor shares an LSH bucket with the
    // query in the 16-dim projected space) × P(it ranks inside the
    // Rerank-deep reduced-space shortlist); 8 × 3-plane tables and
    // Rerank=100 keep the product comfortably above the floor here,
    // and the final ranks are exact cosine
    assert(recall >= 0.5, s"recall@5 = $recall")
    info(f"JL-LSH recall@5 = $recall%.3f")
    // shape: TopK rows per query
    val out = Jl.annJl(spark, dir)
    import org.apache.spark.sql.functions._
    assert(out.groupBy("query_id").count()
      .filter(col("count") =!= Ann.TopK).count() == 0)
  }

  test("projection is linear: P(u + v) = P(u) + P(v) to double precision") {
    val ids = vecs.keys.toSeq.sorted.take(4)
    val (u, v) = (vecs(ids(0)), vecs(ids(1)))
    val sum = u.indices.map(i => u(i) + v(i))
    val lhs = projectD(sum)
    val rhs = projectD(u).zip(projectD(v)).map { case (a, b) => a + b }
    lhs.indices.foreach(j => assert(math.abs(lhs(j) - rhs(j)) < 1e-9))
  }
}
