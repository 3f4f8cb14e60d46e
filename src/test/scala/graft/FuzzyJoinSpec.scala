package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.FuzzyJoin

/** q75 invariants. Value-level equivalence vs the DuckDB twin runs
  * through graft.Verify + tools/verify_local.py. */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("typo classes within the edit budget match; far names do not") {
    import spark.implicits._
    val a = Seq((1L, "Springfield"), (2L, "Shelbyville"), (3L, "Ogdenville"))
      .toDF("a_key", "a_name")
    val b = Seq(
      (10L, "Sprngfield"),   // deletion -> dist 1, matches 1
      (11L, "Shelbyvilles"), // insertion -> dist 1, matches 2
      (12L, "Ogdanville"),   // substitution -> dist 1, matches 3
      (13L, "Ogtown"),       // same block, dist > 1 -> no match
      (14L, "Xpringfield")   // dist 1 but different block -> missed (documented)
    ).toDF("b_key", "b_name")
    val got = FuzzyJoin.fuzzyJoin(a, b)
      .select("a_key", "b_key").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 11L), (3L, 12L)))
  }

  test("q75: every corrupted twin is recovered (blocking never loses the planted edits)") {
    val nNames = Tables.part(spark, dir).select("p_name").distinct().count()
    val out = operators.FuzzyJoin.fuzzyPartMatch(spark, dir).cache()
    // each distinct name must at least match its own twin
    val selfPairs = out.filter(col("b_key") === col("a_key") + 1000000)
    assert(selfPairs.count() == nNames)
    assert(out.filter(col("dist") > FuzzyJoin.MaxDist).count() == 0)
    out.unpersist()
  }

  test("q75 plan: blocked equi-join, never a cartesian/nested-loop pair generation") {
    val plan = operators.FuzzyJoin.fuzzyPartMatch(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
