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

  test("pagerankUntil stops early on an already-converged graph") {
    import spark.implicits._
    // 8-ring, both directions: d=2 everywhere and Scale/8 divides
    // evenly, so the uniform start IS the exact integer fixed point —
    // round 1's delta is 0 and the loop must stop immediately
    val ring = (0L until 8L).flatMap(i =>
      Seq((i, (i + 1) % 8), ((i + 1) % 8, i))).toDF("src", "dst")
    val (ranks, rounds) = Graph.pagerankUntil(ring, maxIters = 20, tol = 0L)
    assert(rounds == 1, s"expected early stop, ran $rounds rounds")
    val vals = ranks.select("centrality").as[Long].collect()
    assert(vals.toSet == Set(Graph.Scale / 8)) // still uniform and exact
  }

  test("pagerankUntil matches fixed-depth pagerank at equal depth") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val fixed = Graph.pagerank(edges, iters = 4).as[(Long, Long)].collect().toMap
    // tol = -1: unreachable, so exactly maxIters rounds run
    val (ranks, rounds) = Graph.pagerankUntil(edges, maxIters = 4, tol = -1L)
    assert(rounds == 4)
    assert(ranks.as[(Long, Long)].collect().toMap == fixed)
  }

  test("redistribution conserves total mass where the plain variant leaks it") {
    import spark.implicits._
    // chain a→b→c: c is dangling and holds substantial mass, so the
    // plain variant evaporates a large share each round
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val iters = 5
    def total(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("centrality")).head.getLong(0)
    val plain = total(Graph.pagerank(edges, iters))
    val redist = total(Graph.pagerankRedistribute(edges, iters))
    val n = 3L; val e = 2L
    val floorBound = iters * (e + 3 * n + 20) // per-round integer-floor leak
    assert(redist <= Graph.Scale)
    assert(redist >= Graph.Scale - floorBound,
      s"redistributed total $redist leaked more than floors allow")
    // the plain variant must have lost real mass (the dangling share),
    // orders of magnitude beyond floor leakage
    assert(plain < redist - Graph.Scale / 10)
  }

  test("labelProp: sync LP on a 4-cycle with min tie-break, hand-computed") {
    import spark.implicits._
    // directed 4-cycle 1→2→3→4→1 (each node has ONE in-neighbor, so
    // every round just shifts labels around the cycle)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val got = operators.Graph.labelProp(edges, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: lbl(v) = id of its predecessor; round 2: two steps back
    assert(got == Map(1L -> 3L, 2L -> 4L, 3L -> 1L, 4L -> 2L))
  }

  test("labelProp: two disjoint triangles never share a community") {
    import spark.implicits._
    def tri(base: Long) = Seq(
      (base, base + 1), (base + 1, base), (base + 1, base + 2),
      (base + 2, base + 1), (base + 2, base), (base, base + 2))
    val edges = (tri(1L) ++ tri(10L)).toDF("src", "dst")
    val got = operators.Graph.labelProp(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val left = Set(1L, 2L, 3L).map(got)
    val right = Set(10L, 11L, 12L).map(got)
    assert(left.intersect(right).isEmpty, s"$left vs $right")
    // min tie-break pulls a symmetric triangle onto its smallest id
    assert(left == Set(1L) && right == Set(10L))
  }

  test("labelPropUntil: a directed chain needs length-1 rounds; fixed-depth can't know that") {
    import spark.implicits._
    // 1→2→…→8: node 1 keeps label 1; after round k node i holds
    // max(1, i−k), so the head's label reaches the tail only at round
    // 7 — deeper than LpIters. Round 8 runs with zero changes and
    // stops the loop.
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = Graph.labelPropUntil(chain, maxIters = 20)
    assert(rounds == 8, s"expected 7 changing rounds + 1 fixed-point check, got $rounds")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 8L).map(_ -> 1L).toMap)
  }

  test("labelPropUntil matches fixed-depth labelProp at equal depth") {
    import spark.implicits._
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("src", "dst")
    val fixed = Graph.labelProp(chain, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (labels, rounds) = Graph.labelPropUntil(chain, maxIters = 4)
    assert(rounds == 4) // still changing at depth 4 — no early stop
    assert(labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == fixed)
  }

  test("adamicAdar maxRightDegree: capped hubs generate NO pairs (exact exclusion)") {
    import spark.implicits._
    // right node 100 is a 6-degree hub, right node 200 a 2-degree
    // rare link; left pair (1, 2) shares both
    val hub = (1L to 6L).map(a => (a, 100L))
    val rare = Seq((1L, 200L), (2L, 200L))
    val inc = (hub ++ rare).toDF("a", "r")
    val capped = Graph.adamicAdar(inc, "a", "r", topK = 100, maxRightDegree = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // ONLY the rare-link pair survives, scored by w(200) alone
    val w200 = math.floor(1000000.0 / math.log(2.0)).toLong
    assert(capped == Map((1L, 2L) -> w200))
    // exclusion semantics: identical to running uncapped on the
    // incidence list with the hub rows deleted
    val deleted = Graph.adamicAdar(rare.toDF("a", "r"), "a", "r", topK = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(capped == deleted)
    // and the default (no cap) keeps the hub's 15 pairs
    val uncapped = Graph.adamicAdar(inc, "a", "r", topK = 100)
    assert(uncapped.count() == 15)
    val w100 = math.floor(1000000.0 / math.log(6.0)).toLong
    val full = uncapped.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(full((1L, 2L)) == w100 + w200)
    assert(full((3L, 4L)) == w100)
  }

  test("q157's registered degree cap is output-neutral on this data") {
    import org.apache.spark.sql.functions._
    // the registered query ships with AaRegisteredDegreeCap (hub
    // safety on skewed graphs); on TPC-H the suppliers-per-part
    // degree is a small constant at every SF, so the cap must never
    // bite — assert the actual max degree sits far below it, and that
    // capped ≡ uncapped on the registered incidence list
    val dir = "/root/testdata/sf0.01"
    val inc = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("s"), col("l_partkey").as("p")).distinct()
    val maxDeg = inc.groupBy("p").count().agg(max("count")).head.getLong(0)
    assert(maxDeg < operators.Graph.AaRegisteredDegreeCap / 10,
      s"max suppliers-per-part $maxDeg approaches the registered cap")
    val capped = operators.Graph.aaSupplierLinks(spark, dir)
      .collect().map(_.toSeq)
    val uncapped = operators.Graph.adamicAdar(
        Tables.lineitem(spark, dir)
          .select(col("l_suppkey").as("s"), col("l_partkey").as("p")),
        "s", "p")
      .collect().map(_.toSeq)
    assert(capped.toSeq == uncapped.toSeq)
  }

  test("labelProp is deterministic and the q147 plan broadcasts no fact side") {
    val dir = "/root/testdata/sf0.001"
    val a = operators.Graph.lpSupplierPart(spark, dir).collect()
      .map(_.toSeq).sortBy(_.toString)
    val b = operators.Graph.lpSupplierPart(spark, dir).collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }
}
