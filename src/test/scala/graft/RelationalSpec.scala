package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator-level invariants at sf0.001 (fast). Full value-level
  * equivalence vs DuckDB runs through graft.Verify + tools/verify_local.py.
  */
class RelationalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"
  import operators.Relational._

  test("q1 pricing summary: one row per (returnflag, linestatus), counts sum to table") {
    val df = pricingSummary(spark, dir).cache()
    assert(df.count() > 0)
    assert(df.select(sum("count_order")).head.getLong(0) ==
      Tables.lineitem(spark, dir).count())
  }

  test("q2 analysis join: one row per nation with customers, ordered segment list") {
    val df = analysisJoin(spark, dir).cache()
    assert(df.count() > 0 && df.count() <= 25)
    val segs = df.select("segments").head.getString(0).split(", ")
    assert(segs.sameElements(segs.sorted))
  }

  test("q3 pivot: one row per customer with orders, status totals") {
    val df = pivotWide(spark, dir)
    assert(df.columns.toSet == Set("o_custkey", "total_f", "total_o", "total_p"))
    assert(df.count() == Tables.orders(spark, dir).select("o_custkey").distinct.count())
  }

  test("q4 unpivot: 3x row multiplication") {
    assert(unpivotLong(spark, dir).count() == 3 * Tables.lineitem(spark, dir).count())
  }

  test("q5 split explode: positions are 1-based and dense") {
    val df = splitExplode(spark, dir)
    assert(df.filter(col("pos") < 1).count() == 0)
    assert(df.count() > Tables.documents(spark, dir).count())
  }

  test("q6 text clean: directionals expanded, commas stripped") {
    val df = textClean(spark, dir).cache()
    assert(df.filter(col("clean_name").startsWith("North ")).count() == df.count())
    assert(df.filter(col("clean_price").isNull).count() == 0)
  }

  test("q7 group index: idx is a permutation within each group") {
    val df = groupIndex(spark, dir)
    val bad = df.groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"), max(col("idx")).as("mx"), min(col("idx")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.count() == 0)
  }

  test("q8 zscore: mean ~0, unit spread") {
    val row = zscore(spark, dir).agg(avg("acctbal_std"), stddev_samp("acctbal_std")).head
    // outputs are round(_, 4)-ed, so tolerances reflect rounding noise
    assert(math.abs(row.getDouble(0)) < 1e-4)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-3)
  }

  test("q9 ratios bounded 0..100") {
    assert(ratioAnalytics(spark, dir)
      .filter(col("prop_f") < 0 || col("prop_f") > 100).count() == 0)
  }

  test("q10 coalesce fill: never null") {
    assert(coalesceFill(spark, dir).filter(col("segment_filled").isNull).count() == 0)
  }

  test("q11 dup check: all multiplicities > 1") {
    assert(dupCheck(spark, dir).filter(col("n_rows") <= 1).count() == 0)
  }

  test("q12 validity filter: envelope holds") {
    val df = validityFilter(spark, dir).cache()
    assert(df.count() > 0)
    assert(df.filter(col("value") < 0 || col("value") > 400).count() == 0)
  }

  test("q13 topk: at most 3 per nation, rank bounded") {
    val df = topkGroup(spark, dir).cache()
    assert(df.groupBy("c_nationkey").count().filter(col("count") > 3).count() == 0)
  }

  test("q14 star join: nonempty, AMERICA nations only") {
    val df = starJoin(spark, dir).cache()
    assert(df.count() > 0 && df.count() <= 5)
  }

  test("q15 anti join: excluded customers really have no big order") {
    val anti = antiSemi(spark, dir)
    val big = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000.0)
      .select("o_custkey").distinct
    assert(anti.join(big, anti("c_custkey") === big("o_custkey")).count() == 0)
  }

  test("q16 percentiles: ordered five-number summary") {
    val bad = percentiles(spark, dir).filter(
      col("bal_min") > col("bal_q1") || col("bal_q1") > col("bal_median") ||
      col("bal_median") > col("bal_q3") || col("bal_q3") > col("bal_max"))
    assert(bad.count() == 0)
  }

  test("q16 scale path: sketch percentiles track exact within 3% of range") {
    // the sketch returns actual data points (no interpolation), so at
    // ~300 rows/group deviations up to a few value-gaps are expected
    val exact = percentiles(spark, dir).select("c_mktsegment", "bal_median", "bal_max", "bal_min")
    val approx = percentilesApprox(spark, dir)
      .select(col("c_mktsegment"), col("bal_median").as("approx_median"))
    val joined = exact.join(approx, "c_mktsegment")
      .withColumn("tol", (col("bal_max") - col("bal_min")) * 0.03)
      .filter(abs(col("bal_median") - col("approx_median")) > col("tol"))
    assert(joined.count() == 0)
  }

  test("separate: fixed-width split with right null fill, delimiter taken literally") {
    import spark.implicits._
    val df = Seq("a|b|c|d", "x|y", "solo", "").toDF("s")
    val out = separate(df, "s", "|", 3).collect().map(r =>
      (r.getString(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(
      ("a", "b", "c"), // extra pieces beyond n are dropped
      ("x", "y", null),
      ("solo", null, null),
      ("", null, null)))
    // a regex metacharacter delimiter must not be interpreted as regex
    val dotted = Seq("1.2.3").toDF("s")
    val r = separate(dotted, "s", ".", 2).head()
    assert(r.getString(1) == "1" && r.getString(2) == "2")
  }

  test("separate: n >= 5 keeps positional column order (no Map hash scramble)") {
    import spark.implicits._
    val df = Seq("a|b|c|d|e|f").toDF("s")
    val out = separate(df, "s", "|", 6)
    assert(out.columns.toSeq ==
      "s" +: (1 to 6).map(i => s"part_$i"))
    assert(out.head.getString(6) == "f")
    intercept[IllegalArgumentException] {
      separate(df, "s", "|", 2, _ => "s") // collides with an input column
    }
  }

  test("q34 separate over documents: first words line up with split positions") {
    val df = separateCols(spark, dir).cache()
    assert(df.count() == Tables.documents(spark, dir).count())
    val probe = Tables.documents(spark, dir)
      .select(col("doc_id"), element_at(split(col("text"), " "), 1).as("w"))
    val joined = df.join(probe, "doc_id")
      .filter(col("word_1") =!= col("w"))
    assert(joined.count() == 0)
  }

  test("q43 rollup: lattice levels are consistent — details sum to subtotals sum to grand total") {
    val df = operators.Relational.rollupStats(spark, dir).cache()
    val detail = df.filter(col("gid") === 0)
    val sub = df.filter(col("gid") === 1)
    val grand = df.filter(col("gid") === 3)
    assert(grand.count() == 1)
    assert(grand.head.getAs[Long]("n_orders") ==
      detail.agg(sum("n_orders")).head.getLong(0))
    assert(sub.agg(sum("n_orders")).head.getLong(0) ==
      detail.agg(sum("n_orders")).head.getLong(0))
    // one subtotal row per status, keyed with NULL priority
    assert(sub.filter(col("o_orderpriority").isNotNull).count() == 0)
    assert(sub.count() == detail.select("o_orderstatus").distinct().count())
  }

  test("q78 cube: all four grouping sets present and mutually consistent") {
    val df = operators.Relational.cubeStats(spark, dir).cache()
    val detail = df.filter(col("gid") === 0)
    val byFlag = df.filter(col("gid") === 1)   // l_linestatus nulled
    val byStatus = df.filter(col("gid") === 2) // l_returnflag nulled
    val grand = df.filter(col("gid") === 3)
    assert(grand.count() == 1)
    val total = grand.head.getAs[Long]("n_items")
    for (level <- Seq(detail, byFlag, byStatus))
      assert(level.agg(sum("n_items")).head.getLong(0) == total)
    // cube (unlike q43's rollup) carries BOTH one-dim margins
    assert(byFlag.count() == detail.select("l_returnflag").distinct().count())
    assert(byStatus.count() == detail.select("l_linestatus").distinct().count())
  }

  test("q50 transitions: probabilities sum to 1 per source, pair counts conserve events") {
    val df = operators.Events.transitions(spark, dir).cache()
    // per from_type, p sums to ~1
    val sums = df.groupBy("from_type").agg(sum("p").as("sp")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-2, r.toString))
    // total transitions = total events - distinct users (each user's
    // first event has no predecessor)
    val ev = Tables.events(spark, dir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(df.agg(sum("n")).head.getLong(0) == expected)
  }

  test("q51 cohort: offsets non-negative, day-0 cohort counts equal cohort sizes") {
    val df = operators.Events.cohortRetention(spark, dir).cache()
    assert(df.filter(col("day_offset") < 0).count() == 0)
    // day 0 of each cohort contains every user of that cohort exactly
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohortSizes = ev.groupBy("user_id").agg(min("day").as("d"))
      .groupBy(date_format(col("d"), "yyyy-MM-dd").as("cohort_day"))
      .agg(count(lit(1)).as("size"))
    val day0 = df.filter(col("day_offset") === 0)
    val bad = day0.join(cohortSizes, "cohort_day")
      .filter(col("n_users") =!= col("size"))
    assert(bad.count() == 0)
    assert(day0.count() == cohortSizes.count())
  }

  test("q44 rolling: cumulative and 5-row frames obey their recurrences") {
    val df = operators.Events.rollingStats(spark, dir)
    // check per-user recurrence on a sample user's full timeline
    val u = df.select("user_id").head.getLong(0)
    val rows = df.filter(col("user_id") === u).orderBy("seq")
      .select("value", "avg_5", "cum_value", "peak_value", "seq").collect()
    var running = 0.0
    var peak = Double.MinValue
    val vals = scala.collection.mutable.ArrayBuffer.empty[Double]
    rows.zipWithIndex.foreach { case (r, i) =>
      val v = r.getDouble(0)
      running += v; peak = math.max(peak, v); vals += v
      assert(r.getLong(4) == i + 1)
      // value column is rounded to 4dp, so the reconstruction drifts by
      // up to 5e-5 per accumulated row
      assert(math.abs(r.getDouble(2) - running) < 1e-4 * (i + 2), s"cum at $i")
      assert(math.abs(r.getDouble(3) - peak) < 1e-9, s"peak at $i")
      val window = vals.takeRight(5)
      assert(math.abs(r.getDouble(1) - window.sum / window.size) < 1e-3, s"avg5 at $i")
    }
    assert(rows.length > 5)
  }
}
