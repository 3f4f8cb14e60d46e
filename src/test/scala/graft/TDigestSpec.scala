package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.TDigest

/** t-digest audit (q287): estimate accuracy on a known distribution,
  * the tail-budget property (p999 sharper than p50 in relative
  * terms), compression, and the registered shape. Value-level oracle
  * equivalence runs through graft.Verify. */
class TDigestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def audit(vs: Seq[Long]) = {
    import spark.implicits._
    TDigest.digestAudit(vs.toDF("v").repartition(8))
      .collect().map(r => r.getLong(r.fieldIndex("q_ppm")) -> r).toMap
  }

  test("uniform 1..10000: every probe lands within 1% of exact") {
    val m = audit((1L to 10000L))
    for ((q, r) <- m) {
      val est = r.getDouble(r.fieldIndex("est"))
      val ex = r.getLong(r.fieldIndex("exact_v")).toDouble
      assert(math.abs(est - ex) / ex < 0.01, s"q=$q est=$est exact=$ex")
    }
  }

  test("compression is real: far fewer centroids than distinct values") {
    val m = audit((1L to 10000L))
    val nc = m(500000L).getLong(m(500000L).fieldIndex("n_centroids"))
    assert(nc <= TDigest.Delta + 1)
    assert(nc >= TDigest.Delta / 2)
  }

  test("tail budget: p999 relative error no worse than 5x p50 on a skewed corpus") {
    // exponential-ish skew via integer decades
    val vs = (0 until 12).flatMap(d =>
      Seq.fill(1 << (11 - d))((1L << d) * 10L))
    val m = audit(vs)
    val err50 = m(500000L).getLong(m(500000L).fieldIndex("err_ppm"))
    val err999 = m(999000L).getLong(m(999000L).fieldIndex("err_ppm"))
    assert(err999 <= (err50 max 1000L) * 50)
  }

  test("point mass: every estimate is the single value, err 0") {
    val m = audit(Seq.fill(500)(42L))
    for ((_, r) <- m) {
      assert(r.getDouble(r.fieldIndex("est")) == 42.0)
      assert(r.getLong(r.fieldIndex("err_ppm")) == 0L)
    }
  }

  test("registered shape: four probes in dollars over order prices") {
    val df = TDigest.orderPriceDigest(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq ==
      Seq("q_ppm", "n_centroids", "est", "exact_v", "err_ppm"))
    assert(rows.map(_.getLong(0)).sorted.toSeq == TDigest.ProbesPpm)
    // est is dollars, exact_v cents: est ≈ exact_v/100 within the audit
    rows.foreach { r =>
      val ratio = r.getDouble(2) / (r.getLong(3) / 100.0)
      assert(ratio > 0.9 && ratio < 1.1)
    }
  }
}
