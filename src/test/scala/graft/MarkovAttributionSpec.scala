package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.MarkovAttribution

/** Markov attribution (q306): closed-form absorption cross-checks on
  * planted graphs, the removal-effect semantics, organic handling,
  * and the registered shape. Value-level oracle equivalence runs
  * through graft.Verify. */
class MarkovAttributionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def attr(edges: Seq[(String, String, Long)]) = {
    import spark.implicits._
    MarkovAttribution.attribution(
      edges.toDF("src", "dst", "n").repartition(4))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("deterministic chain start→view→conv: removing view kills everything") {
    val m = attr(Seq(("start", "view", 10L), ("view", "conv", 10L)))
    val v = m("view")
    assert(v.getLong(v.fieldIndex("base_conv_ppb")) == 1000000000L)
    assert(v.getLong(v.fieldIndex("removal_conv_ppb")) == 0L)
    assert(v.getLong(v.fieldIndex("share_ppm")) == 1000000L)
    // channels never on a converting path get zero share
    assert(m("click").getLong(m("click").fieldIndex("effect_ppb")) == 0L)
  }

  test("branching absorption matches the closed form") {
    // start → view (1/2) | click (1/2); view → conv (1/2) | null;
    // click → conv (1/4) | null(3/4)
    // P(conv) = 1/2·1/2 + 1/2·1/4 = 3/8
    val m = attr(Seq(
      ("start", "view", 50L), ("start", "click", 50L),
      ("view", "conv", 25L), ("view", "null", 25L),
      ("click", "conv", 25L), ("click", "null", 75L)))
    val base = m("view").getLong(m("view").fieldIndex("base_conv_ppb"))
    assert(math.abs(base - 375000000L) <= 2L)
    // removing view: P = 1/2·1/4 = 1/8; effect 1/4
    val v = m("view")
    assert(math.abs(v.getLong(v.fieldIndex("removal_conv_ppb"))
      - 125000000L) <= 2L)
    // shares: view effect 1/4, click effect 1/8 → 2/3 vs 1/3
    assert(math.abs(v.getLong(v.fieldIndex("share_ppm")) - 666666L) <= 2L)
  }

  test("self-loops converge: view→view cycling still absorbs") {
    // view loops half the time: P(conv|view) = 0.5·P + 0.5·... solve:
    // p = 1/2 p + 1/2 → p = 1 eventually; with conv 1/4, null 1/4:
    // p = 1/2 p + 1/4 → p = 1/2
    val m = attr(Seq(("start", "view", 8L),
      ("view", "view", 4L), ("view", "conv", 2L), ("view", "null", 2L)))
    val base = m("view").getLong(m("view").fieldIndex("base_conv_ppb"))
    assert(math.abs(base - 500000000L) <= 4L)
  }

  test("organic start→conv mass dilutes every removal effect equally") {
    val m = attr(Seq(
      ("start", "view", 50L), ("view", "conv", 50L),
      ("start", "conv", 50L)))
    // base = 1/2 (via view) + 1/2 (organic) = 1... start row: c_start_view
    // and c_start_conv each half → p = (50·1e9 + 50·1e9) div 100 = 1e9
    val v = m("view")
    assert(v.getLong(v.fieldIndex("base_conv_ppb")) == 1000000000L)
    // removing view leaves the organic half
    assert(v.getLong(v.fieldIndex("removal_conv_ppb")) == 500000000L)
  }

  test("registered shape: three channels, shares partition 1e6") {
    val df = MarkovAttribution.eventMarkovAttribution(
      spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq == Seq("channel", "base_conv_ppb",
      "removal_conv_ppb", "effect_ppb", "share_ppm"))
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      MarkovAttribution.Channels.sorted)
    val base = rows.map(_.getLong(1)).distinct
    assert(base.length == 1 && base.head > 0L)
    rows.foreach(r => assert(r.getLong(3) >= 0L))
    val shares = rows.map(_.getLong(4)).sum
    assert(shares > 1000000L - 10L && shares <= 1000000L)
  }
}
