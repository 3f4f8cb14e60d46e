package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The sketch stream quartet under the replay gate (q332–q335, r16
  * verdict #3): each scrambled replay must equal its batch sketch
  * query EXACTLY — the driver hash-gates against the batch oracle, so
  * these tests pin the same equality under sbt at sf0.001. */
class SketchStreamGateSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case s: Seq[_] => s.toList
      case x => x
    }).toSet

  test("q332: HLL stream replay (scrambled + dup redelivery) ≡ batch q245") {
    assert(rows(streaming.HllStream.replayHll(spark, dir)) ==
      rows(operators.Hll.orderkeyHll(spark, dir)))
  }

  test("q333: KMV stream replay (scrambled + dup redelivery) ≡ batch q264") {
    assert(rows(streaming.KmvStream.replayKmv(spark, dir)) ==
      rows(operators.Kmv.orderkeyKmv(spark, dir)))
  }

  test("q334: CMS stream replay (scrambled) ≡ batch q246") {
    assert(rows(streaming.CountMinStream.replayCms(spark, dir)) ==
      rows(operators.CountMin.partkeyCms(spark, dir)))
  }

  test("q335: DDSketch stream replay (scrambled) ≡ batch q260") {
    assert(rows(streaming.DdSketchStream.replayDdSketch(spark, dir)) ==
      rows(operators.DdSketch.orderPriceDdSketch(spark, dir)))
  }

  // the late-tolerant trio (q336–q338): bounded scramble with
  // CROSS-boundary lateness — the reordered-Kafka contract

  test("q336: late CUSUM replay ≡ batch q105 summary") {
    assert(rows(streaming.LateStream.replayCusumLate(spark, dir)) ==
      rows(operators.Changepoint.eventsCusum(spark, dir)))
  }

  test("q337: late TWAP replay ≡ batch q113") {
    assert(rows(streaming.LateStream.replayTwapLate(spark, dir)) ==
      rows(operators.Twap.userTwap(spark, dir)))
  }

  test("q338: late Mann–Kendall replay ≡ batch q143") {
    assert(rows(streaming.LateStream.replayMkLate(spark, dir)) ==
      rows(operators.MannKendall.orderRevenueTrend(spark, dir)))
  }
}
