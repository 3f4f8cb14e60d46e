package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Assortativity

/** Assortativity (q218): the classic exact anchors — star = −1,
  * path = −0.5, regular graph NULL. Value-level oracle equivalence
  * runs through graft.Verify. */
class AssortativitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  /** symmetrize an undirected edge list and run */
  private def r(und: Seq[(Long, Long)]) = {
    import spark.implicits._
    val arcs = und ++ und.map { case (a, b) => (b, a) }
    val row = Assortativity.assortativity(arcs.toDF("src", "dst")
      .repartition(4)).collect().head
    row
  }

  test("star K1,3 is perfectly disassortative: r = −1 exactly") {
    val row = r(Seq((0L, 1L), (0L, 2L), (0L, 3L)))
    assert(row.getDouble(row.fieldIndex("assortativity")) == -1.0)
    assert(row.getLong(row.fieldIndex("n_nodes")) == 4L)
    assert(row.getLong(row.fieldIndex("n_arcs")) == 6L)
  }

  test("path of 4: r = −0.5 exactly (ends drag the middle down)") {
    val row = r(Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    assert(row.getDouble(row.fieldIndex("assortativity")) == -0.5)
  }

  test("regular graph (triangle) has zero degree variance: NULL") {
    val row = r(Seq((0L, 1L), (1L, 2L), (2L, 0L)))
    assert(row.isNullAt(row.fieldIndex("assortativity")))
  }

  test("degree-homophilous components read r = 1 exactly") {
    // K3 (all deg 2) ⊎ one edge (both deg 1): every node links only
    // to its own degree — perfect assortativity
    val row = r(Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L)))
    assert(row.getDouble(row.fieldIndex("assortativity")) == 1.0)
  }
}
