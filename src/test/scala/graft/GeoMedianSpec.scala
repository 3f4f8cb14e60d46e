package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.GeoMedian

/** Geometric median (q307): robustness against a planted outlier (the
  * property the centroid lacks), objective improvement, symmetric
  * exactness, and the registered shape. Value-level oracle
  * equivalence runs through graft.Verify. */
class GeoMedianSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def med(pts: Seq[(Long, Long)]) = {
    import spark.implicits._
    GeoMedian.geometricMedian(
      pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
        .repartition(4))
      .collect().head
  }

  test("an extreme outlier drags the centroid but barely moves the median") {
    // tight cluster at (1000, 1000) ± 10, one point at (1000000, 1000000)
    val cluster = (0 until 50).map(i =>
      (1000L + (i % 5), 1000L + (i / 5 % 5)))
    val r = med(cluster :+ ((1000000L, 1000000L)))
    assert(math.abs(r.getLong(r.fieldIndex("med_x")) - 1000L) < 300L)
    assert(math.abs(r.getLong(r.fieldIndex("med_y")) - 1000L) < 300L)
    // centroid sits ~(20600, 20600): its mean distance is far worse
    assert(r.getLong(r.fieldIndex("mean_dist_median")) <
      r.getLong(r.fieldIndex("mean_dist_centroid")))
  }

  test("symmetric cloud: median = centroid = center of symmetry") {
    val pts = for (dx <- -2L to 2L; dy <- -2L to 2L)
      yield (100L + dx * 10, 200L + dy * 10)
    val r = med(pts)
    assert(math.abs(r.getLong(r.fieldIndex("med_x")) - 100L) <= 1L)
    assert(math.abs(r.getLong(r.fieldIndex("med_y")) - 200L) <= 1L)
  }

  test("median never worsens the mean-distance objective") {
    val pts = (0 until 200).map(i =>
      (((i * 7919) % 5000).toLong, ((i * 104729) % 5000).toLong))
    val r = med(pts)
    assert(r.getLong(r.fieldIndex("mean_dist_median")) <=
      r.getLong(r.fieldIndex("mean_dist_centroid")))
  }

  test("single point: the median is the point itself") {
    val r = med(Seq((42L, 99L)))
    assert(r.getLong(r.fieldIndex("med_x")) == 42L)
    assert(r.getLong(r.fieldIndex("med_y")) == 99L)
  }

  test("registered shape: one row per nation, medians inside the range") {
    val df = GeoMedian.nationCustomerMedian(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq == Seq("c_nationkey", "n_pts", "med_x", "med_y",
      "mean_dist_centroid", "mean_dist_median"))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (x, y) = (r.getLong(2), r.getLong(3))
      assert(x >= 0L && x < 80000000L)
      assert(y >= 0L && y < 340000000L)
      assert(r.getLong(r.fieldIndex("mean_dist_median")) <=
        r.getLong(r.fieldIndex("mean_dist_centroid")))
    }
  }
}
