package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import textstats.QuantileNorm

/** Quantile normalization (q300): shifted groups converge to the
  * pooled mean, an identity check, rank preservation logic via the
  * inclusive spine, and the registered shape. Value-level oracle
  * equivalence runs through graft.Verify. */
class QuantileNormSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def norm(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    QuantileNorm.quantileNormSummary(
      rows.toDF("g", "v").repartition(4))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("two shifted uniform groups converge onto the pooled mean") {
    // group a = 0..99, group b = 1000..1099: raw means 49.5 / 1049.5;
    // pooled distribution is their union — after normalization both
    // means land near the pooled mean 549.5
    val rows = (0L until 100L).map(v => ("a", v)) ++
      (0L until 100L).map(v => ("b", v + 1000L))
    val m = norm(rows)
    val (ra, rb) = (m("a"), m("b"))
    assert(ra.getDouble(ra.fieldIndex("mean_raw")) == 49.5)
    assert(rb.getDouble(rb.fieldIndex("mean_raw")) == 1049.5)
    val na = ra.getDouble(ra.fieldIndex("mean_norm"))
    val nb = rb.getDouble(rb.fieldIndex("mean_norm"))
    assert(math.abs(na - nb) < 30.0) // calibrated to the same scale
    assert(na > 400 && na < 700)
  }

  test("a single group maps onto itself (identity up to step rounding)") {
    val rows = (0L until 50L).map(v => ("a", v * 2))
    val m = norm(rows)
    val r = m("a")
    assert(math.abs(r.getDouble(r.fieldIndex("mean_norm")) -
      r.getDouble(r.fieldIndex("mean_raw"))) < 2.1)
  }

  test("negative scores survive (no trunc-vs-floor division hazard)") {
    val rows = (0L until 40L).map(v => ("a", v - 100L)) ++
      (0L until 40L).map(v => ("b", v - 60L))
    val m = norm(rows)
    assert(m("a").getDouble(2) < 0.0)
    // normalized means sit between the two raw means
    val nm = m("a").getDouble(3)
    assert(nm > -100.0 && nm < -20.0)
  }

  test("registered shape: one row per language, counts positive") {
    val df = QuantileNorm.langScoreNorm(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq ==
      Seq("lang", "n_rows", "mean_raw", "mean_norm"))
    assert(rows.nonEmpty)
    // normalized means are more concentrated than raw means
    if (rows.length > 1) {
      def spread(i: Int) = {
        val vs = rows.map(_.getDouble(i))
        vs.max - vs.min
      }
      assert(spread(3) <= spread(2) * 1.5)
    }
  }
}
