package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import ann.Centroids

/** Centroid similarity (q292): hand-planted orthogonal/parallel
  * populations, mean correctness under the fixed-point floor, and the
  * registered shape. Value-level oracle equivalence runs through
  * graft.Verify. */
class CentroidsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def sim(rows: Seq[(Int, Seq[Double])]) = {
    import spark.implicits._
    Centroids.centroidSimilarity(
      rows.map { case (l, v) => (l, v.map(_.toFloat).toArray) }
        .toDF("label", "embedding").repartition(4))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
  }

  /** 64-dim basis-ish vector with mass on one axis plus jitter. */
  private def axis(i: Int, jit: Double = 0.0): Seq[Double] =
    Seq.tabulate(Centroids.Dim)(d =>
      (if (d == i) 1.0 else 0.0) + (if (d == (i + 7) % 64) jit else 0.0))

  test("orthogonal populations: centroid cosine ≈ 0") {
    val rows = (0 until 10).map(k => (0, axis(0, 0.01 * k))) ++
      (0 until 10).map(k => (1, axis(32, 0.01 * k)))
    val r = sim(rows)((0, 1))
    assert(math.abs(r.getDouble(r.fieldIndex("cos_centroid"))) < 0.05)
    assert(r.getLong(r.fieldIndex("n_a")) == 10L)
    assert(r.getLong(r.fieldIndex("n_b")) == 10L)
  }

  test("identical populations: centroid cosine = 1") {
    val rows = (0 until 8).map(_ => (0, axis(3))) ++
      (0 until 5).map(_ => (1, axis(3)))
    val r = sim(rows)((0, 1))
    assert(r.getDouble(r.fieldIndex("cos_centroid")) == 1.0)
  }

  test("three labels produce the full lower pair set") {
    val rows = Seq((0, axis(0)), (1, axis(1)), (2, axis(2)))
    val m = sim(rows)
    assert(m.keySet == Set((0, 1), (0, 2), (1, 2)))
  }

  test("centroid is the mean: a mixed pair sits between its parents") {
    // label 0 = axis0; label 1 = half axis0, half axis1 → cos = 1/√2
    val rows = (0 until 6).map(_ => (0, axis(0))) ++
      Seq((1, axis(0)), (1, axis(1)))
    val r = sim(rows)((0, 1))
    assert(math.abs(r.getDouble(r.fieldIndex("cos_centroid")) -
      1.0 / math.sqrt(2)) < 1e-3)
  }

  test("registered shape: all label pairs, n sums to corpus size") {
    val df = Centroids.labelCentroidSim(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq ==
      Seq("label_a", "label_b", "n_a", "n_b", "cos_centroid"))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getDouble(r.fieldIndex("cos_centroid"))
      assert(c >= -1.0001 && c <= 1.0001)
    }
  }
}
