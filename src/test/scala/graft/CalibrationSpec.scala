package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.{Calibration, Graph}

/** Calibration/ECE (q156) and Adamic–Adar (q157) invariants.
  * Cross-engine parity runs through the oracle gate. */
class CalibrationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  import spark.implicits._

  private def runCal(rows: Seq[(Long, String, String)]) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cal").toString
    rows.toDF("o_orderkey", "o_orderdate", "o_orderstatus")
      .selectExpr("o_orderkey", "CAST(o_orderdate AS DATE) AS o_orderdate",
        "o_orderstatus")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Calibration.orderFinishCalibration(spark, tmp).collect()
  }

  test("a correctly-specified baseline calibrates: small ECE, small gaps") {
    // year decides the finish rate exactly; train and eval splits see
    // the same process, so confidence ≈ accuracy in every bin
    val rows = (1L to 6000L).map { k =>
      val year = 1992 + (k % 3).toInt
      val rate = year match { case 1992 => 10; case 1993 => 50; case _ => 90 }
      (k, s"$year-03-01", if (k % 100 < rate) "F" else "O")
    }
    val out = runCal(rows)
    assert(out.nonEmpty)
    val ece = out.head.getDouble(out.head.fieldIndex("ece"))
    assert(ece < 0.03, s"well-specified model miscalibrated: ece = $ece")
    out.foreach { r =>
      assert(r.getDouble(r.fieldIndex("gap")) < 0.05,
        s"bin ${r.getLong(0)} gap ${r.getDouble(r.fieldIndex("gap"))}")
    }
  }

  test("planted overconfidence: the gap and ECE expose it") {
    // the train split (hash buckets < 5) finishes far more often than
    // eval — build it by keying the rate on the SAME hash the operator
    // splits with, so train sees 90% while eval sees 30%
    import graft.functions.Hashing
    val rows = (1L to 6000L).map { k =>
      val b = java.lang.Long.parseLong(
        Hashing.md5hex(s"${Calibration.Seed}:$k").substring(0, 12), 16) % 10
      val rate = if (b < 5) 90 else 30
      (k, "1995-03-01", if (k % 100 < rate) "F" else "O")
    }
    val out = runCal(rows)
    val ece = out.head.getDouble(out.head.fieldIndex("ece"))
    assert(ece > 0.4, s"planted 60-point miscalibration missed: ece = $ece")
  }

  test("ECE is the n-weighted mean gap (driver recompute)") {
    val out = Calibration.orderFinishCalibration(spark, "/root/testdata/sf0.01")
      .collect()
    val n = out.map(_.getLong(1)).sum
    // integer recompute on the micro grid the operator defines
    val eceMicro = out.map(r => r.getLong(1) *
      math.round(r.getDouble(r.fieldIndex("gap")) * 1e6)).sum / n
    val got = math.round(out.head.getDouble(out.head.fieldIndex("ece")) * 1e6)
    assert(math.abs(got - eceMicro) <= 1, s"$got vs $eceMicro")
  }

  test("Adamic–Adar: hand-computed shared-neighbor weights") {
    // parts: p1 shared by (1,2) deg 2; p2 by (1,2,3) deg 3; p3 only by 3
    val inc = Seq((1L, 101L), (2L, 101L), (1L, 102L), (2L, 102L),
      (3L, 102L), (3L, 103L)).toDF("s", "p")
    val out = Graph.adamicAdar(inc, "s", "p").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val w2 = math.floor(1e6 / math.log(2.0)).toLong
    val w3 = math.floor(1e6 / math.log(3.0)).toLong
    assert(out == Map(
      (1L, 2L) -> ((2L, w2 + w3)), // shares p1 (deg2) and p2 (deg3)
      (1L, 3L) -> ((1L, w3)),
      (2L, 3L) -> ((1L, w3))))
  }

  test("q157 ordering: scores descend, ties break on the pair") {
    val out = Graph.aaSupplierLinks(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty && out.length <= Graph.AaTopK)
    val keys = out.map(r => (r.getLong(r.fieldIndex("aa_micro")),
      r.getLong(0), r.getLong(1)))
    keys.zip(keys.tail).foreach { case ((s1, a1, b1), (s2, a2, b2)) =>
      assert(s1 > s2 || (s1 == s2 && (a1 < a2 || (a1 == a2 && b1 < b2))))
    }
  }
}
