package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Binning

/** Binning/histogram/heavy-hitter invariants at sf0.001. Value-level
  * equivalence vs DuckDB runs through graft.Verify + verify_local.py. */
class BinningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("q47 ntile: quartiles are balanced within 1 and ordered by value per nation") {
    val df = Binning.ntileBin(spark, dir).cache()
    assert(df.filter(col("bal_quartile") < 1 || col("bal_quartile") > Binning.NtileBins)
      .count() == 0)
    // per nation, bin sizes differ by at most 1
    val sizes = df.groupBy("c_nationkey", "bal_quartile").count()
      .groupBy("c_nationkey")
      .agg((max("count") - min("count")).as("spread"))
    assert(sizes.filter(col("spread") > 1).count() == 0)
    // a higher quartile never holds a smaller balance than a lower one
    val bounds = df.groupBy("c_nationkey", "bal_quartile")
      .agg(min("c_acctbal").as("lo"), max("c_acctbal").as("hi"))
    val bad = bounds.as("a").join(bounds.as("b"),
      col("a.c_nationkey") === col("b.c_nationkey") &&
        col("a.bal_quartile") < col("b.bal_quartile") &&
        col("a.hi") > col("b.lo"))
    assert(bad.count() == 0)
  }

  test("quantileCutBins scale path: bins are monotone in value and roughly balanced") {
    val df = Binning.quantileCutBins(
      Tables.customer(spark, dir).select(col("c_custkey"), col("c_acctbal")),
      "c_acctbal", 4).cache()
    val bounds = df.groupBy("bin").agg(min("c_acctbal").as("lo"), max("c_acctbal").as("hi"))
      .orderBy("bin").collect()
    bounds.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(2) <= b.getDouble(1), "bins overlap")
    case _ => ()
    }
    val n = df.count().toDouble
    val sizes = df.groupBy("bin").count().collect().map(_.getLong(1))
    assert(sizes.length == 4)
    sizes.foreach(s => assert(math.abs(s - n / 4) < n * 0.1, s"unbalanced bin: $s of $n"))
  }

  test("quantileCutBins: empty and all-null inputs yield null bins, not a crash") {
    import spark.implicits._
    val empty = Seq.empty[(Long, java.lang.Double)].toDF("k", "v")
    assert(Binning.quantileCutBins(empty, "v", 4).count() == 0)
    val allNull = Seq((1L, null: java.lang.Double), (2L, null: java.lang.Double))
      .toDF("k", "v")
    val out = Binning.quantileCutBins(allNull, "v", 4)
    assert(out.count() == 2 && out.filter(col("bin").isNotNull).count() == 0)
    // mixed: null values get null bins, non-null rows still bin
    val mixed = Seq((1L, java.lang.Double.valueOf(1.0)), (2L, null: java.lang.Double),
      (3L, java.lang.Double.valueOf(9.0))).toDF("k", "v")
    val m = Binning.quantileCutBins(mixed, "v", 2).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(m(2L) == -1L && m(1L) >= 0L && m(3L) >= 0L)
  }

  test("q48 histogram: bins cover the range, counts sum to filtered rows") {
    val df = Binning.histogram(spark, dir).cache()
    val events = Tables.events(spark, dir)
      .filter(col("value").isNotNull && col("value") >= Binning.HistLo
        && col("value") <= Binning.HistHi)
    assert(df.agg(sum("n")).head.getLong(0) == events.count())
    assert(df.filter(col("bin") < 0 || col("bin") >= Binning.HistBins).count() == 0)
    // avg of each bin sits inside the bin's value range (last bin takes the top edge)
    val width = (Binning.HistHi - Binning.HistLo) / Binning.HistBins
    val bad = df.filter(col("avg_value") < col("bin_lo")
      || (col("avg_value") > col("bin_lo") + width && col("bin") < Binning.HistBins - 1))
    assert(bad.count() == 0)
  }

  test("q53 expectations: clean checks pass, planted violations are counted exactly") {
    import spark.implicits._
    import operators.Expectations
    val df = Expectations.orderExpectations(spark, dir).cache()
    assert(df.count() == 7)
    // the deliberately tight check carries real violations; contract checks pass
    val m = df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(m("key_not_null") == ((0L, 1)) && m("key_unique") == ((0L, 1)))
    assert(m("status_domain")._2 == 1 && m("date_range")._2 == 1)
    assert(m("price_under_400k")._1 > 0 && m("price_under_400k")._2 == 0)
    // synthetic frame with known violations, including a null in the set check
    val t = Seq((1L, "A", 5.0), (2L, null: String, 50.0), (2L, "B", -1.0))
      .toDF("k", "s", "v")
    val rep = Expectations.report(t, Seq(
      Expectations.notNull("s_not_null", col("s")),
      Expectations.inSet("s_domain", col("s"), Seq("A", "B")),
      Expectations.inRange("v_range", col("v"), lit(0.0), lit(10.0))),
      uniqueKey = Some("k_unique" -> col("k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("s_not_null") == 1L)
    assert(rep("s_domain") == 0L) // NULL is not a domain violation (SQL semantics)
    assert(rep("v_range") == 2L)  // 50.0 out of range + -1.0
    assert(rep("k_unique") == 1L)
  }

  test("q49 heavy hitters: exactly K rows, ranked by tf, df <= tf and df <= corpus size") {
    val df = textstats.TextStats.heavyHitters(spark, dir).cache()
    assert(df.count() == textstats.TextStats.HeavyHittersK)
    val rows = df.orderBy("rank").collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      val (ta, tb) = (a.getAs[Long]("tf"), b.getAs[Long]("tf"))
      assert(ta > tb || (ta == tb && a.getAs[String]("term") < b.getAs[String]("term")))
    case _ => ()
    }
    val nDocs = Tables.documents(spark, dir).count()
    assert(df.filter(col("df") > col("tf") || col("df") > nDocs).count() == 0)
  }
}
