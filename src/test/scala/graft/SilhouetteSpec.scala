package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import ann.Silhouette

/** Simplified silhouette (q220): exact hand values on axis centroids,
  * tie → 0, duplicate-centroid guard, per-cluster means. Value-level
  * oracle equivalence runs through graft.Verify. */
class SilhouetteSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private val axes: Seq[(Int, Seq[Double])] =
    Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0))

  private def sil(vs: Seq[(Long, Seq[Double])],
      cent: Seq[(Int, Seq[Double])] = axes) = {
    import spark.implicits._
    Silhouette.silhouette(
      vs.toDF("vec_id", "embedding").repartition(4), cent)
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  test("axis-aligned vectors read s = 1 in their own cluster") {
    val m = sil(Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0)))
    assert(m(0).getDouble(m(0).fieldIndex("mean_sil")) == 1.0)
    assert(m(1).getDouble(m(1).fieldIndex("mean_sil")) == 1.0)
    assert(m(0).getDouble(m(0).fieldIndex("mean_cos")) == 1.0)
  }

  test("the exact diagonal ties: elected to the higher cell with s = 0") {
    val m = sil(Seq(1L -> Seq(1.0, 1.0)))
    assert(m.keySet == Set(1))
    assert(m(1).getDouble(m(1).fieldIndex("mean_sil")) == 0.0)
  }

  test("per-cluster means: a diagonal drags its cluster to 0.5") {
    val m = sil(Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0),
      3L -> Seq(1.0, 1.0)))
    assert(m(0).getDouble(m(0).fieldIndex("mean_sil")) == 1.0)
    assert(m(1).getDouble(m(1).fieldIndex("mean_sil")) == 0.5)
    assert(m(1).getLong(m(1).fieldIndex("n_vecs")) == 2L)
  }

  test("duplicate-direction centroids guard to s = 0, not a blowup") {
    val dup: Seq[(Int, Seq[Double])] =
      Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(1.0, 0.0))
    val m = sil(Seq(1L -> Seq(1.0, 0.0)), dup)
    val r = m.values.head
    assert(r.getDouble(r.fieldIndex("mean_sil")) == 0.0)
  }

  test("a between-clusters vector scores the hand value 0.5") {
    // v = (3,4)/5: cos to (0,1) = 0.8, to (1,0) = 0.6 →
    // s = (0.8−0.6)/(1−0.6) = 0.5 exactly in the double chain
    val m = sil(Seq(1L -> Seq(3.0, 4.0)))
    assert(m(1).getDouble(m(1).fieldIndex("mean_sil")) == 0.5)
  }
}
