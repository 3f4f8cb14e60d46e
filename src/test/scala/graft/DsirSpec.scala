package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import textstats.Dsir

/** DSIR importance-resampling invariants. Value-level equivalence vs
  * the DuckDB twin runs through graft.Verify + tools/verify_local.py. */
class DsirSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("target-like docs score higher than target-unlike docs") {
    import spark.implicits._
    // target (en) vocabulary is disjoint from the rest: en-only tokens
    // get ratio ≈ 1e6 · (ct+1)/(cr+1) with ct = cr, others ct = 0
    val docs = (
      (1L to 20L).map(i => (i, "alpha beta gamma delta", "en", "web")) ++
      (21L to 40L).map(i => (i, "uno dos tres cuatro", "es", "web")) ++
      // mixed doc: half target vocabulary
      Seq((41L, "alpha beta uno dos", "es", "web"))
    ).toDF("doc_id", "text", "lang", "source")
    // reach inside: compute every doc's score by running the operator
    // with sampling disabled via the score column of kept rows, plus
    // a direct check on the planted extremes that survive sampling
    val kept = Dsir.importanceResample(docs)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    val enScores = kept.filter(_._1 <= 20L).values
    val esScores = kept.filter(k => k._1 >= 21L && k._1 <= 40L).values
    // acceptance ∝ score: every kept en doc must outscore every kept es doc
    assert(enScores.nonEmpty)
    if (esScores.nonEmpty) {
      assert(enScores.min > esScores.max)
      kept.get(41L).foreach { m =>
        assert(m < enScores.min && m > esScores.max)
      }
    }
  }

  test("keep rate lands near the designed ~50% and is reproducible") {
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    val a = Dsir.importanceResample(docs)
    val b = Dsir.importanceResample(docs)
    val ka = a.count()
    assert(ka == b.count())
    assert(a.select("doc_id").collect().map(_.getLong(0)).toSet ==
      b.select("doc_id").collect().map(_.getLong(0)).toSet)
    // mean-capped acceptance: keep rate in a loose [20%, 80%] band
    assert(ka > n / 5 && ka < n * 4 / 5)
  }

  test("scores are nonnegative and bounded by the ratio-form ceiling") {
    val out = Dsir.importanceResample(Tables.documents(spark, dir))
    // ratio_b ≤ 1e6 (target ⊆ raw) and F ≈ Tr/Tt·1e6; with en the
    // dominant slice F < 8e6, so w and any mean of w stay under 8e12
    assert(out.filter(col("score") < 0).count() == 0)
    assert(out.filter(col("score") > 8000000000000L).count() == 0)
  }

  test("q67 plan: weight table is broadcast; corpus is never shuffled by text") {
    val plan = Dsir.importanceResample(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
