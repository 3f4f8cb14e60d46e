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

  // r17 widening: five more twins under the gate (q340–q344)

  test("q340: EWMA stream replay (in-order + dup redelivery) ≡ batch q124") {
    assert(rows(streaming.EwmaStream.replayEwma(spark, dir)) ==
      rows(operators.Ewma.userEwma(spark, dir)))
  }

  test("q341: conversion changelog replay ≡ batch q132") {
    assert(rows(streaming.PropStream.replayConv(spark, dir)) ==
      rows(operators.PropTest.purchaseRateTest(spark, dir)))
  }

  test("q342: bootstrap-CI stream replay (scrambled) ≡ batch q144") {
    assert(rows(streaming.BootstrapStream.replayBootstrapCi(spark, dir)) ==
      rows(operators.Bootstrap.segmentBalanceCi(spark, dir)))
  }

  test("q343: group-sequential replay (scrambled, realized total) ≡ batch q153") {
    assert(rows(streaming.SequentialStream.replayObf(spark, dir)) ==
      rows(operators.Sequential.orderFinishMonitor(spark, dir)))
  }

  test("q344: trend-cell changelog replay ≡ batch q168") {
    assert(rows(streaming.TrendStream.replayTrendCells(spark, dir)) ==
      rows(operators.TrendTest.priorityFinishTrend(spark, dir)))
  }

  test("q345: windowed KS drift replay ≡ per-window batch q99 ksTest") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import streaming.DriftStream.{KsDriftCutoffMs, KsDriftWindowMs}
    // independent batch derivation: per daily window, Hypothesis.ksTest
    // over (window rows as X) vs (the frozen baseline expanded as Y)
    val ev = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(expr("unix_millis(ts)").as("ms"),
        floor(col("value") * 100.0).cast("double").as("v"))
    val baseRows = ev.filter(col("ms") < KsDriftCutoffMs)
      .select(col("v")).collect().map(_.getDouble(0)).toSeq
    val winFrames = ev.filter(col("ms") >= KsDriftCutoffMs)
      .select((col("ms") / KsDriftWindowMs).cast("long")
        .*(KsDriftWindowMs).as("ws"), col("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val tagged = winFrames.map { case (ws, v) => (ws, "X", v) } ++
      winFrames.map(_._1).distinct.flatMap(ws =>
        baseRows.map(v => (ws, "Y", v)))
    val batch = operators.Hypothesis
      .ksTest(tagged.toDF("ws", "c", "v"), "ws", "c", "X", "Y", "v")
      .select(col("ws").as("ws_ms"), col("n_x").as("n_window"),
        col("d_stat"), col("ks_z"))
    assert(rows(streaming.DriftStream.replayKsDrift(spark, dir)) ==
      rows(batch))
  }
}
