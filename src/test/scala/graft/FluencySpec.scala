package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import textstats.Fluency

/** q74 invariants. Value-level equivalence vs the DuckDB twin runs
  * through graft.Verify + tools/verify_local.py. */
class FluencySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("repeated fluent phrasing outscores unique gibberish") {
    import spark.implicits._
    // 30 docs repeat the same sentence (high bigram counts); 10 docs
    // are pairwise-disjoint token soup (every bigram count = 1)
    val fluent = (1L to 30L).map(i => (i, "the cat sat on the mat"))
    val noise = (31L to 40L).map(i =>
      (i, s"zq$i xw$i vv$i kj$i pp$i mm$i"))
    val out = Fluency.fluencyScore((fluent ++ noise).toDF("doc_id", "text"))
      .select("doc_id", "fluency", "label")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val fMin = fluent.map(d => out(d._1)._1).min
    val nMax = noise.map(d => out(d._1)._1).max
    assert(fMin > nMax)
    fluent.foreach(d => assert(out(d._1)._2 == 1))
    noise.foreach(d => assert(out(d._1)._2 == 0))
  }

  test("docs without bigrams are out of scope; scores bounded") {
    import spark.implicits._
    val docs = Seq((1L, "single"), (2L, ""), (3L, "two tokens here"))
      .toDF("doc_id", "text")
    val out = Fluency.fluencyScore(docs)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(3L))
    val real = Fluency.fluencyScore(Tables.documents(spark, dir)).cache()
    assert(real.filter(col("fluency") < 0).count() == 0)
    // p-hat <= ~1 in 1e-6 units modulo smoothing/collisions: loose cap
    assert(real.filter(col("fluency") > 2 * Fluency.PScale).count() == 0)
    real.unpersist()
  }

  test("q74 plan: scores checkpointed once (mean + labeling reuse), no cartesian") {
    val plan = Fluency.fluencyScore(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD")) // the checkpointed doc-grade scores
    assert(!plan.contains("parquet")) // labeling never re-scans the corpus
    assert(!plan.contains("CartesianProduct"))
  }
}
