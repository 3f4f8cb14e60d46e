package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.DpRelease

/** Seeded Laplace release (q243): noise matches the driver-side
  * inverse-CDF reference exactly, clamping is enforced pre-sum, tags
  * give independent noise, determinism across runs, and noise
  * magnitude sits on the b = sens/ε scale. Value-level oracle
  * equivalence runs through graft.Verify. */
class DpReleaseSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def frame(rows: Seq[(String, Double)]) = {
    import spark.implicits._
    rows.toDF("g", "v")
  }

  /** Driver reference of the engine's deterministic Laplace draw. */
  private def lapRef(tag: String, g: String, b: Double): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$tag:$g".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val h = java.lang.Long.parseLong(hex, 16)
    val u = (h + 0.5) / 281474976710656.0
    val ln = math.floor(math.log(1.0 - 2.0 * math.abs(u - 0.5)) * 1e9 + 0.5) / 1e9
    -b * (if (u >= 0.5) 1.0 else -1.0) * ln
  }

  test("noisy values equal true + reference noise exactly (round-4)") {
    val rows = Seq(("A", 10.0), ("A", 20.0), ("A", -5.0), ("B", 100.0))
    val got = DpRelease.release(frame(rows), "t1").collect()
      .map(r => r.getString(0) -> r).toMap
    def check(g: String, n: Long, s: Double): Unit = {
      val r = got(g)
      val nNoise = lapRef(s"t1:n", g, 1.0 / DpRelease.Epsilon)
      val sNoise = lapRef(s"t1:s", g, DpRelease.Clamp / DpRelease.Epsilon)
      assert(math.abs(r.getDouble(1) - (n + nNoise)) < 1e-3,
        s"$g count ${r.getDouble(1)} want ${n + nNoise}")
      assert(math.abs(r.getDouble(2) - (s + sNoise)) < 1e-3,
        s"$g sum ${r.getDouble(2)} want ${s + sNoise}")
    }
    check("A", 3, 25.0)
    check("B", 1, 100.0)
  }

  test("clamping binds BEFORE the sum: an outlier contributes at most C") {
    val c = DpRelease.Clamp
    val rows = Seq(("A", 1.0), ("A", 5 * c)) // second value clamps to C
    val r = DpRelease.release(frame(rows), "t2").collect().head
    val sNoise = lapRef("t2:s", "A", c / DpRelease.Epsilon)
    assert(math.abs(r.getDouble(2) - (1.0 + c + sNoise)) < 1e-3)
  }

  test("deterministic per tag; different tags draw independent noise") {
    val rows = Seq(("A", 50.0), ("B", 60.0))
    val a1 = DpRelease.release(frame(rows), "e1").collect().map(_.toSeq).toSet
    val a2 = DpRelease.release(frame(rows), "e1").collect().map(_.toSeq).toSet
    val b1 = DpRelease.release(frame(rows), "e2").collect().map(_.toSeq).toSet
    assert(a1 == a2, "same tag must reproduce the identical release")
    assert(a1 != b1, "a rotated tag must draw fresh noise")
  }

  test("registered q243 at sf0.001: 5 segments, plausible noise scales") {
    val rows = DpRelease.segmentBalanceRelease(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      // count noise scale b = 2: noisy count stays near a real
      // segment count (150 customers / 5 segments ≈ 30 at sf0.001)
      assert(r.getDouble(r.fieldIndex("count_noisy")) > 5.0)
      assert(r.getDouble(r.fieldIndex("count_noisy")) < 100.0)
      assert(r.getDouble(r.fieldIndex("epsilon")) == DpRelease.Epsilon)
      assert(r.getDouble(r.fieldIndex("clamp")) == DpRelease.Clamp)
    }
  }
}
