package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Graph

/** PageRank invariants. Value-level equivalence vs the unrolled DuckDB
  * CTE runs through graft.Verify + tools/verify_local.py. */
class GraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("hand-computed 3-node chain matches the integer recurrence exactly") {
    import spark.implicits._
    // 1 -> 2 -> 3, symmetrized: deg(1)=deg(3)=1, deg(2)=2
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    // replicate the recurrence in driver Longs
    val n = 3L; val base = 3L * Graph.Scale / (20L * n)
    var r = Map(1L -> Graph.Scale / n, 2L -> Graph.Scale / n, 3L -> Graph.Scale / n)
    val deg = Map(1L -> 1L, 2L -> 2L, 3L -> 1L)
    val in = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L))
    for (_ <- 1 to Graph.Iters)
      r = r.map { case (v, _) =>
        v -> (base + 17L * in(v).map(u => r(u) / deg(u)).sum / 20L)
      }
    val got = Graph.pagerank(edges).as[(Long, Long)].collect().toMap
    assert(got == r)
  }

  test("star graph: hub outranks every leaf; all ranks >= base term") {
    import spark.implicits._
    val leaves = (1L to 8L)
    val edges = (leaves.map(l => (0L, l)) ++ leaves.map(l => (l, 0L)))
      .toDF("src", "dst")
    val got = Graph.pagerank(edges).as[(Long, Long)].collect().toMap
    val n = 9L; val base = 3L * Graph.Scale / (20L * n)
    assert(leaves.forall(l => got(0L) > got(l)))
    assert(got.values.forall(_ >= base))
    // leaves are symmetric -> identical ranks
    assert(leaves.map(got).toSet.size == 1)
  }

  test("dangling node: receives base + inflow but leaks its own mass") {
    import spark.implicits._
    // 1 -> 2 only: node 2 has no out-edges
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = Graph.pagerank(edges, iters = 1).as[(Long, Long)].collect().toMap
    val n = 2L; val base = 3L * Graph.Scale / (20L * n)
    assert(got(1L) == base) // no inflow
    assert(got(2L) == base + 17L * (Graph.Scale / n) / 20L)
  }

  test("mass bound: total centrality never exceeds Scale") {
    val out = Graph.pagerankSupplierPart(spark, dir)
    val total = out.agg(sum("centrality")).head.getLong(0)
    assert(total <= Graph.Scale)
    assert(total > Graph.Scale / 2) // floors leak a little, not half
  }

  test("q65 plan: equi-joins + hash aggregates, no cartesian/nested loop") {
    val plan = Graph.pagerankSupplierPart(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
