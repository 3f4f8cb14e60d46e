package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.WeightedSample

/** Efraimidis–Spirakis weighted sampling without replacement (q160):
  * parity with the row_number formulation the DuckDB twin runs,
  * exactly-k-per-domain with no repeats, w ≤ 0 exclusion, and the ES
  * inclusion-probability law P(win) = w_i/Σw measured across many
  * independent hash-keyed domains. Value-level oracle equivalence runs
  * through graft.Verify. */
class WeightedSampleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  /** The spec's own copy of the ES key chain (pins the contract):
    * snap9(ln((hash48(seed,id)+1)/2^48)) / w. */
  private def withEs(df: DataFrame): DataFrame = df
    .withColumn("h", graft.functions.Hashing.hash48(
      WeightedSample.Seed, col("id").cast("string")))
    .withColumn("es", expr(
      "CAST(floor(ln((CAST(h AS DOUBLE) + 1.0) / 281474976710656.0)" +
        " * 1e9 + 5e-1) AS DOUBLE) / 1e9 / CAST(w AS DOUBLE)"))

  test("election parity with the row_number window formulation") {
    import spark.implicits._
    val rows = for (g <- 0 until 7; i <- 0 until 200)
      yield (s"dom$g", (g * 200 + i).toLong, (i % 13 + 1).toLong)
    val df = rows.toDF("g", "id", "w").repartition(11)
    val k = 15
    val got = WeightedSample.esSample(df, "g", "id", "w", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    val want = withEs(df)
      .withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("es").desc, col("id"))))
      .filter(col("rk") <= k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(5))).toSet
    assert(got == want)
  }

  test("exactly k rows per domain, no repeated ids, deterministic") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (s"d${i % 4}", i, i % 7 + 1))
      .toDF("g", "id", "w")
    val out = WeightedSample.esSample(df, "g", "id", "w", 10).cache()
    val perDom = out.groupBy("g").agg(
      count(lit(1)).as("n"), countDistinct("id").as("nd")).collect()
    assert(perDom.length == 4)
    perDom.foreach(r => assert(r.getLong(1) == 10L && r.getLong(2) == 10L))
    // re-run elects the identical set (pure function of the row keys)
    val again = WeightedSample.esSample(df, "g", "id", "w", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == out.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    out.unpersist()
  }

  test("w <= 0 rows are excluded; k beyond the positive pool returns the pool") {
    import spark.implicits._
    val df = Seq(("g", 1L, 5L), ("g", 2L, 0L), ("g", 3L, -3L), ("g", 4L, 2L))
      .toDF("g", "id", "w")
    val got = WeightedSample.esSample(df, "g", "id", "w", 10)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(1L, 4L))
  }

  test("inclusion probability ~ w/sum(w): the 9:1 item wins ~90% of domains") {
    import spark.implicits._
    // 1000 independent two-item domains (distinct ids → independent
    // hash draws); ES law: P(heavy wins) = 9/(9+1). Deterministic
    // given the fixed hash family — the observed count is one fixed
    // Binomial(1000, 0.9) draw, asserted within ±4 sd.
    val rows = (0 until 1000).flatMap { g =>
      Seq((s"g$g", 2L * g.toLong, 1L), (s"g$g", 2L * g + 1L, 9L))
    }
    val df = rows.toDF("g", "id", "w")
    val winners = WeightedSample.esSample(df, "g", "id", "w", 1)
      .collect().map(r => r.getLong(1))
    assert(winners.length == 1000)
    val heavyWins = winners.count(_ % 2 == 1)
    // mean 900, sd ~9.5; ±4 sd band
    assert(heavyWins > 862 && heavyWins < 938, s"heavyWins=$heavyWins")
  }

  test("registered q160 shape at sf0.001: k per source, ranks 1..k") {
    val out = WeightedSample.sourceWeightedSample(spark, "/root/testdata/sf0.001")
      .cache()
    val perSrc = out.groupBy("source")
      .agg(count(lit(1)).as("n"), max("rk").as("mx"), min("rk").as("mn"))
      .collect()
    assert(perSrc.nonEmpty)
    perSrc.foreach { r =>
      val n = r.getLong(1)
      assert(n <= WeightedSample.K)
      assert(r.getInt(2) == n && r.getInt(3) == 1) // ranks are 1..n dense
    }
    out.unpersist()
  }
}
