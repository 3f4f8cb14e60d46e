package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import functions.ArrayMax
import operators.HyperBall

/** HyperBall (q271): pointwise-max aggregate laws, exact-ball truth
  * on a hand path graph, sketch-vs-exact band on a clique union, and
  * the registered shape. Value-level oracle equivalence runs through
  * graft.Verify. */
class HyperBallSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  test("array_max_agg: elementwise max across partitions, idempotent") {
    import spark.implicits._
    val rows = Seq(
      Seq(1, 0, 5, 0), Seq(0, 3, 2, 0), Seq(1, 3, 0, 0),
      Seq(1, 0, 5, 0) // duplicate redelivery
    ).map(Tuple1(_)).toDF("arr").repartition(3)
    val got = rows.agg(ArrayMax.arrayMax(col("arr"), 4).as("m"))
      .selectExpr("m").as[Seq[Int]].collect().head
    assert(got == Seq(1, 3, 5, 0))
  }

  private def nf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    // symmetrize like the registered graph
    val e = (edges ++ edges.map(_.swap)).toDF("src", "dst")
    HyperBall.neighborhoodFunction(e).collect()
      .map(r => r.getInt(0) -> r).toMap
  }

  test("path graph: exact sampled ball sizes follow the BFS truth") {
    // path over ids 0-10-20-30-40; balls: hop1 avg = (2+3+3+3+2)/5,
    // hop2 = (3+4+5+4+3)/5, hop3 = (4+5+5+5+4)/5 over ALL nodes — the
    // sampled column only changes WHICH nodes enter the exact average,
    // so recompute the expectation for the sampled subset directly
    val ids = Seq(0L, 10L, 20L, 30L, 40L)
    val exact1 = Map(0L -> 2, 10L -> 3, 20L -> 3, 30L -> 3, 40L -> 2)
    val exact2 = Map(0L -> 3, 10L -> 4, 20L -> 5, 30L -> 4, 40L -> 3)
    val sampled = ids.filter { v =>
      java.lang.Long.parseLong(
        functions.Hashing.md5hex(v.toString).substring(0, 12), 16) %
        HyperBall.Stride == 0
    }
    val byHop = nf(ids.sliding(2).map(p => (p.head, p.last)).toSeq)
    val r1 = byHop(1)
    assert(r1.getLong(r1.fieldIndex("n_nodes")) == 5L)
    assert(r1.getLong(r1.fieldIndex("n_sampled")) == sampled.size.toLong)
    if (sampled.nonEmpty) {
      val want1 = sampled.map(exact1).sum.toDouble / sampled.size
      val want2 = sampled.map(exact2).sum.toDouble / sampled.size
      assert(r1.getDouble(r1.fieldIndex("avg_ball_exact_sampled")) == want1)
      val r2 = byHop(2)
      assert(r2.getDouble(r2.fieldIndex("avg_ball_exact_sampled")) == want2)
    }
    // hop 3 is sketch-only by design: the exact columns are NULL
    val r3 = byHop(3)
    assert(r3.isNullAt(r3.fieldIndex("avg_ball_exact_sampled")))
    assert(r3.isNullAt(r3.fieldIndex("rel_err_sampled")))
  }

  test("sketch average tracks the exact average within the m=64 band") {
    // a 60-node star forest: hub h connects to 19 leaves, 3 copies —
    // hop-2 balls are the whole 20-node component for every node
    val edges = for (c <- 0L until 3L; l <- 1L until 20L)
      yield (c * 100L, c * 100L + l)
    val byHop = nf(edges)
    val r2 = byHop(2)
    val est = r2.getDouble(r2.fieldIndex("avg_ball_hll"))
    assert(math.abs(est - 20.0) / 20.0 < 0.3, s"hop-2 est $est vs 20")
    // monotone: balls only grow
    assert(byHop(1).getDouble(byHop(1).fieldIndex("avg_ball_hll")) <= est + 1e-9)
  }

  test("registered shape: three hop rows, sane errors") {
    val rows = HyperBall
      .supplierPartHyperBall(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_sampled")) > 0L)
      if (r.getInt(r.fieldIndex("hop")) <= HyperBall.ExactHops)
        assert(math.abs(r.getDouble(r.fieldIndex("rel_err_sampled"))) < 0.4)
      else assert(r.isNullAt(r.fieldIndex("rel_err_sampled")))
    }
  }
}
