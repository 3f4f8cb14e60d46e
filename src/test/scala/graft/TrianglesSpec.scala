package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Triangles

/** Triangle-counting invariants. Value-level equivalence vs the DuckDB
  * twin runs through graft.Verify + tools/verify_local.py. */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("K4: every node is in C(3,2)=3 triangles, clustering 1.0") {
    import spark.implicits._
    val nodes = 1L to 4L
    val edges = (for (a <- nodes; b <- nodes if a < b) yield (a, b)).toDF("a", "b")
    val got = Triangles.triangles(edges)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.keySet == nodes.toSet)
    assert(got.values.forall(_ == ((3L, 3L, 1000000L))))
  }

  test("triangle with a pendant: counts and ppm coefficients exact") {
    import spark.implicits._
    // 1-2-3 triangle, 4 hangs off 3 (degree 3 there): cc(3) = 2·1/(3·2)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("a", "b")
    val got = Triangles.triangles(edges)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == ((2L, 1L, 1000000L)))
    assert(got(2L) == ((2L, 1L, 1000000L)))
    assert(got(3L) == ((3L, 1L, 2L * 1000000L / 6L)))
    assert(got(4L) == ((1L, 0L, 0L)))
  }

  test("square (C4): no triangles anywhere; direction/dup/self-loop cleaning") {
    import spark.implicits._
    // edges given in mixed orientation with dups and a self-loop
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (4L, 3L), (4L, 1L), (2L, 2L))
      .toDF("a", "b")
    val got = Triangles.triangles(edges)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.values.forall { case (d, t, c) => d == 2L && t == 0L && c == 0L })
  }

  test("global triangle identity: sum of per-node counts = 3 x triangles") {
    val out = Triangles.partCopurchase(spark, dir)
    val total = out.agg(org.apache.spark.sql.functions.sum("n_triangles"))
      .head.getLong(0)
    assert(total % 3 == 0, s"per-node counts must triple-count: $total")
    assert(total > 0, "co-purchase graph at sf0.001 should close some triangles")
  }

  test("q77 plan: degree-ordered wedges use equi-joins only, no cartesian") {
    val plan = Triangles.partCopurchase(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
