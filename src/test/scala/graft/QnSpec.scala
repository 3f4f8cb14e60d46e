package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Qn

/** Qn robust scale (q240): brute-force order-statistic parity on
  * hand multisets, the zero-distance cell path, location-freeness,
  * 50% breakdown vs a planted outlier mass, the n<2 drop, and the
  * loud cell guard. Value-level oracle equivalence runs through
  * graft.Verify. */
class QnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def cellsOf(xs: Seq[Long], g: String = "g1") = {
    import spark.implicits._
    xs.groupBy(identity).map { case (v, o) => (g, v, o.size.toLong) }
      .toSeq.toDF("g", "v", "c")
  }

  /** Reference: literal k-th order statistic of all pairwise dists. */
  private def bruteQnRaw(xs: Seq[Long]): Long = {
    val n = xs.length
    val h = n / 2 + 1
    val k = h.toLong * (h - 1) / 2
    val dists = (for (i <- xs.indices; j <- i + 1 until n)
      yield math.abs(xs(i) - xs(j))).sorted
    dists((k - 1).toInt)
  }

  private def qnRaw(xs: Seq[Long]): Long =
    Qn.qnScale(cellsOf(xs)).collect().head.getLong(3)

  test("matches the brute-force pairwise order statistic on hand multisets") {
    val cases = Seq(
      Seq(1L, 2L, 4L, 8L, 16L),
      Seq(3L, 3L, 3L, 7L, 7L, 50L),
      Seq(0L, 0L, 0L, 0L, 1L),            // dominated by the 0-distance cell
      Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L),
      (1L to 20L) ++ Seq(100L, 200L),
    )
    cases.foreach { xs =>
      assert(qnRaw(xs) == bruteQnRaw(xs), s"multiset $xs")
    }
  }

  test("random multisets against brute force") {
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { _ =>
      val xs = Seq.fill(30)(rnd.nextInt(12).toLong)
      assert(qnRaw(xs) == bruteQnRaw(xs), s"multiset $xs")
    }
  }

  test("location-free: shifting every value leaves Qn unchanged") {
    val xs = Seq(1L, 5L, 9L, 9L, 14L, 22L)
    assert(qnRaw(xs) == qnRaw(xs.map(_ + 1000L)))
  }

  test("50% breakdown: under half the mass at an outlier moves Qn little") {
    val clean = Seq.fill(12)(Seq(10L, 11L, 12L, 13L)).flatten // 48 tight values
    val dirty = clean ++ Seq.fill(20)(100000L) // 20/68 < half at a far point
    val qd = qnRaw(dirty)
    assert(qd <= 3L, s"Qn exploded to $qd under <50% contamination")
  }

  test("n < 2 groups drop (no pair distances exist)") {
    import spark.implicits._
    val cells = Seq(("solo", 5L, 1L), ("pair", 3L, 2L)).toDF("g", "v", "c")
    val got = Qn.qnScale(cells).collect().map(r => r.getString(0) -> r).toMap
    assert(!got.contains("solo"))
    assert(got("pair").getLong(3) == 0L) // the one distance is 0
  }

  test("the cell guard fires loudly past MaxCells") {
    import spark.implicits._
    val wide = (0L until Qn.MaxCells + 1).map(v => ("g1", v, 1L))
      .toDF("g", "v", "c")
    val e = intercept[Exception](Qn.qnScale(wide).collect())
    assert(e.getMessage.contains("qnScale") ||
      Option(e.getCause).exists(_.getMessage.contains("qnScale")))
  }

  private def bruteSnRaw(xs: Seq[Long]): Long = {
    val n = xs.length
    val hth = math.min(n / 2 + 1, n - 1) // himed index, capped for n=2
    val lth = (n + 1) / 2
    val hms = xs.indices.map { i =>
      val ds = xs.indices.filter(_ != i).map(j => math.abs(xs(i) - xs(j))).sorted
      ds(hth - 1)
    }.sorted
    hms(lth - 1)
  }

  private def snRaw(xs: Seq[Long]): Long =
    operators.Qn.snScale(cellsOf(xs)).collect().head.getLong(2)

  test("Sn matches the brute-force nested-median reference") {
    val cases = Seq(
      Seq(1L, 2L, 4L, 8L, 16L),
      Seq(3L, 3L, 3L, 7L, 7L, 50L),
      Seq(0L, 0L, 0L, 0L, 1L),
      Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L),
      Seq(5L, 9L), // n = 2: himed caps to the single distance
    )
    cases.foreach(xs => assert(snRaw(xs) == bruteSnRaw(xs), s"multiset $xs"))
    val rnd = new scala.util.Random(13)
    (1 to 5).foreach { _ =>
      val xs = Seq.fill(25)(rnd.nextInt(10).toLong)
      assert(snRaw(xs) == bruteSnRaw(xs), s"multiset $xs")
    }
  }

  test("Sn: location-free and 50%-breakdown, like Qn") {
    val xs = Seq(1L, 5L, 9L, 9L, 14L, 22L)
    assert(snRaw(xs) == snRaw(xs.map(_ + 500L)))
    val clean = Seq.fill(12)(Seq(10L, 11L, 12L, 13L)).flatten
    val dirty = clean ++ Seq.fill(20)(100000L)
    assert(snRaw(dirty) <= 3L)
  }

  test("registered q244 at sf0.001: one Sn row per return flag") {
    val rows = operators.Qn.quantitySn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val raw = r.getLong(r.fieldIndex("sn_raw"))
      assert(raw > 0L && raw < 50L, s"sn_raw $raw")
    }
  }

  test("registered q240 at sf0.001: one row per return flag, sane scale") {
    val rows = Qn.quantityQn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val raw = r.getLong(r.fieldIndex("qn_raw"))
      // quantity is uniform-ish on 1..50: Qn sits well inside (0, 50)
      assert(raw > 0L && raw < 50L, s"qn_raw $raw")
      assert(r.getDouble(r.fieldIndex("qn")) == raw * 2.2219 ||
        math.abs(r.getDouble(r.fieldIndex("qn")) - raw * 2.2219) < 1e-9)
    }
  }
}
