package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q71/q72/q73 invariants. Value-level equivalence vs the DuckDB twins
  * runs through graft.Verify + tools/verify_local.py. */
class RobustSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("q71: planted gross outlier is fenced; clean bulk is not") {
    import spark.implicits._
    // 99 values at 100.00 ± small noise, one at 10000.00
    val rows = (1 to 99).map(i => ("A", 100.0 + (i % 7) * 0.01)) :+ ("A", 10000.0)
    val df = rows.toDF("c_mktsegment", "c_acctbal")
    val out = operators.Robust.madOutliers(spark, dir) // smoke: runs on real data
    assert(out.count() > 0)
    // direct check on the planted frame via the same expressions
    val x2 = df.selectExpr("c_mktsegment AS segment",
      "CAST(round(c_acctbal * 100) AS BIGINT) * 2 AS x2")
    val med = x2.groupBy("segment").agg(expr("percentile(x2, 0.5)").as("med2"))
    val dev = x2.join(med, "segment").withColumn("dev2", abs(col("x2") - col("med2")))
    val mad = dev.groupBy("segment").agg(expr("percentile(dev2, 0.5)").as("mad2"))
    val flagged = dev.join(mad, "segment")
      .filter(expr(s"dev2 > ${operators.Robust.FenceSql} * mad2")).count()
    assert(flagged == 1L) // exactly the planted point
  }

  test("q71: mean-based z-score misses what MAD catches (robustness)") {
    // with a huge outlier inflating stddev, |z| of moderate outliers
    // shrinks; MAD's fence is unaffected — assert MAD flags a point
    // whose z-score stays under 3
    import spark.implicits._
    val rows = (1 to 96).map(i => 100.0 + (i % 5) * 0.01) ++
      Seq(150.0, 1e6, 1e6, 1e6) // 150 is mild; 1e6s wreck the stddev
    val df = rows.map(("A", _)).toDF("seg", "x")
    val stats = df.agg(avg("x").as("mu"), stddev_samp("x").as("sd"),
      expr("percentile(CAST(round(x * 100) AS BIGINT) * 2, 0.5)").as("med2")).head()
    val (mu, sd, med2) = (stats.getDouble(0), stats.getDouble(1), stats.getDouble(2))
    val z150 = math.abs(150.0 - mu) / sd
    assert(z150 < 3.0) // z-score blind to it
    val dev2 = df.selectExpr(s"abs(CAST(round(x * 100) AS BIGINT) * 2 - $med2) AS d")
    val mad2 = dev2.agg(expr("percentile(d, 0.5)")).head().getDouble(0)
    assert(math.abs(150.0 * 200 - med2) > 3 * 1.4826 * mad2) // MAD catches it
  }

  test("q72: grid is contiguous per user; gaps carry the last value forward") {
    val out = operators.Resample.hourlyLocf(spark, dir).cache()
    // contiguity: per user, row count == span hours + 1
    import spark.implicits._
    val bad = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        (unix_timestamp(max("hour")) - unix_timestamp(min("hour"))).as("spanSec"))
      .filter(col("n") =!= col("spanSec") / 3600 + 1)
    assert(bad.count() == 0)
    // LOCF: every gap row carries exactly the previous row's value
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("hour")
    val lagged = out.withColumn("prev", lag("value_filled", 1).over(w))
    assert(lagged.filter(col("is_gap") === 1 &&
      !(col("value_filled") <=> col("prev"))).count() == 0)
    // observed hours keep their own value
    assert(out.filter(col("is_gap") === 0 && col("n_events") === 0).count() == 0)
    out.unpersist()
  }

  test("q73: planted mutations classify exactly") {
    import spark.implicits._
    val old = Seq((1L, "A", 10.0), (5L, "B", 20.0), (13L, "C", 30.0),
      (14L, "D", 40.0)).toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val neu = Seq((1L, "A", 10.0), (5L, "B", 120.0), (14L, "Z", 40.0),
      (99L, "N", 1.0)).toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val got = operators.Diff.snapshotDiff(old, neu, "c_custkey",
      Seq("c_mktsegment", "c_acctbal"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      (5L, "changed", "c_acctbal"),
      (13L, "removed", ""),
      (14L, "changed", "c_mktsegment"),
      (99L, "added", "")))
    // unchanged key 1 is absent
  }

  test("q102: exact line survives 25% gross corruption; OLS does not") {
    import spark.implicits._
    // 15 points exactly on y = 2x + 3, plus 5 wildly corrupt rows
    val clean = (1 to 15).map(i => ("g", i.toDouble, 2.0 * i + 3.0))
    val dirty = (1 to 5).map(i => ("g", 100.0 + i, -5000.0 * i))
    val df = (clean ++ dirty).toDF("g", "x", "y")
    val ts = operators.Robust.theilSen(df, "g", "x", "y").head()
    assert(ts.getDouble(ts.fieldIndex("slope")) == 2.0)
    assert(ts.getDouble(ts.fieldIndex("intercept")) == 3.0)
    assert(ts.getLong(ts.fieldIndex("n_rows")) == 20L)
    // the least-squares slope on the same data is dragged far negative
    val ols = df.agg(
      (covar_pop(col("x"), col("y")) / var_pop(col("x"))).as("b")).head().getDouble(0)
    assert(ols < 0.0, s"OLS should be corrupted, got $ols")
  }

  test("q102: weighted median matches brute-force over repeated points") {
    import spark.implicits._
    // duplicated points exercise the cell weights: brute force expands
    val pts = Seq((1.0, 1.0), (1.0, 1.0), (2.0, 5.0), (3.0, 4.0),
      (3.0, 4.0), (3.0, 4.0), (4.0, 6.0))
    val df = pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val allSlopes = (for {
      i <- pts.indices; j <- pts.indices
      if pts(i)._1 < pts(j)._1
    } yield (pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1)).sorted
    // lower weighted median over the expanded pair list
    val bruteM = allSlopes((allSlopes.size - 1) / 2)
    val expectM = { // smallest s with 2*rank >= total
      val n = allSlopes.size
      allSlopes.zipWithIndex.collectFirst {
        case (s, i) if 2 * (i + 1) >= n => s }.get
    }
    assert(bruteM == expectM) // sanity on the two formulations
    val ts = operators.Robust.theilSen(df, "g", "x", "y").head()
    assert(ts.getDouble(ts.fieldIndex("slope")) ==
      (math.rint(expectM * 1e6) / 1e6))
  }

  test("q322: Sen band brackets the point estimate and matches brute ranks") {
    import spark.implicits._
    // noisy line: slopes spread, so the band is non-degenerate
    val pts = (1 to 12).map(i =>
      ("g", i.toDouble, 2.0 * i + (if (i % 3 == 0) 1.5 else -0.5)))
    val df = pts.toDF("g", "x", "y")
    val r = operators.Robust.theilSenCi(df, "g", "x", "y").head()
    val (m, lo, hi) = (r.getDouble(r.fieldIndex("slope")),
      r.getDouble(r.fieldIndex("slope_lo")), r.getDouble(r.fieldIndex("slope_hi")))
    assert(lo <= m && m <= hi, s"band [$lo, $hi] must bracket $m")
    assert(lo < hi, "band must be non-degenerate on noisy data")
    // brute-force the same convention: k1/k2 order statistics on the
    // expanded slope list with the x-tie-corrected Kendall variance
    val slopes = (for {
      i <- pts.indices; j <- pts.indices
      if pts(i)._2 < pts(j)._2
    } yield (pts(j)._3 - pts(i)._3) / (pts(j)._2 - pts(i)._2)).sorted
    val n = pts.size.toDouble
    val v = n * (n - 1) * (2 * n + 5) / 18.0 // no x ties here
    val cz = 1.96 * math.sqrt(v)
    val k1 = math.max(1, math.floor((slopes.size - cz) / 2.0).toInt + 1)
    val k2 = math.min(slopes.size, math.ceil((slopes.size + cz) / 2.0).toInt)
    assert(lo == math.rint(slopes(k1 - 1) * 1e6) / 1e6)
    assert(hi == math.rint(slopes(k2 - 1) * 1e6) / 1e6)
  }

  test("q322: constant-x group yields NULL band, counts intact") {
    import spark.implicits._
    val df = Seq(("g", 1.0, 2.0), ("g", 1.0, 9.0)).toDF("g", "x", "y")
    val r = operators.Robust.theilSenCi(df, "g", "x", "y").head()
    assert(r.getLong(r.fieldIndex("n_rows")) == 2L)
    assert(r.isNullAt(r.fieldIndex("slope")) &&
      r.isNullAt(r.fieldIndex("slope_lo")) && r.isNullAt(r.fieldIndex("slope_hi")))
  }

  test("q102: constant-x group yields NULL fit, counts intact") {
    import spark.implicits._
    val df = Seq(("g", 5.0, 1.0), ("g", 5.0, 2.0), ("g", 5.0, 3.0),
      ("h", 1.0, 1.0), ("h", 2.0, 3.0)).toDF("g", "x", "y")
    val out = operators.Robust.theilSen(df, "g", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").isNullAt(out("g").fieldIndex("slope")))
    assert(out("g").isNullAt(out("g").fieldIndex("intercept")))
    assert(out("g").getLong(out("g").fieldIndex("n_rows")) == 3L)
    assert(out("h").getDouble(out("h").fieldIndex("slope")) == 2.0)
    assert(out("h").getDouble(out("h").fieldIndex("intercept")) == -1.0)
  }
}
