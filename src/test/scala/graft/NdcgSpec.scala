package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Ndcg

/** NDCG@k (q190): perfect/worst rankings, the within-cell tie
  * expectation, the k-window cell cut, and the IDCG cap. Value-level
  * oracle equivalence runs through graft.Verify. */
class NdcgSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def disc(i: Int): Double = 1.0 / (math.log(i + 1.0) / math.log(2.0))

  private def ndcg(rows: Seq[(Long, Int)], k: Int) = {
    import spark.implicits._
    Ndcg.ndcgAtK(rows.toDF("s", "y").repartition(3), "s", "y", k)
      .collect().head
  }

  test("perfect ranking of distinct scores: NDCG = 1") {
    val rows = (1L to 10L).map(s => (s, if (s >= 8L) 1 else 0))
    val r = ndcg(rows, 3)
    assert(r.getLong(r.fieldIndex("n_pos")) == 3L)
    assert(r.getDouble(r.fieldIndex("ndcg")) == 1.0)
  }

  test("positives buried below the k window: NDCG = 0") {
    val rows = (1L to 10L).map(s => (s, if (s <= 2L) 1 else 0))
    val r = ndcg(rows, 3)
    assert(r.getDouble(r.fieldIndex("dcg")) == 0.0)
    assert(r.getDouble(r.fieldIndex("ndcg")) == 0.0)
  }

  test("tie cell takes the exact permutation expectation") {
    // one cell: nt = 4, np = 2, k = 4 → DCG = 2·Σd(1..4)/4
    val rows = Seq((5L, 1), (5L, 1), (5L, 0), (5L, 0))
    val r = ndcg(rows, 4)
    val expDcg = 2.0 * (disc(1) + disc(2) + disc(3) + disc(4)) / 4.0
    val expIdcg = disc(1) + disc(2)
    assert(math.abs(r.getDouble(r.fieldIndex("dcg")) - expDcg) < 2e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("idcg")) - expIdcg) < 2e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("ndcg")) - expDcg / expIdcg)
      < 2e-6)
  }

  test("a cell straddling the k boundary contributes only in-window slots") {
    // top cell (2 rows, both pos) then a 5-row cell with 2 pos; k = 3:
    // the big cell occupies only position 3 → term = 2·d3/5
    val rows = Seq.fill(2)((9L, 1)) ++
      (Seq.fill(2)((5L, 1)) ++ Seq.fill(3)((5L, 0)))
    val r = ndcg(rows, 3)
    val expDcg = disc(1) + disc(2) + 2.0 * disc(3) / 5.0
    val expIdcg = disc(1) + disc(2) + disc(3) // pos_all = 4 capped at k
    assert(math.abs(r.getDouble(r.fieldIndex("dcg")) - expDcg) < 2e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("idcg")) - expIdcg) < 2e-6)
  }

  test("fewer positives than k: IDCG stops at n_pos") {
    val rows = Seq((3L, 1), (2L, 0), (1L, 0))
    val r = ndcg(rows, 3)
    assert(math.abs(r.getDouble(r.fieldIndex("idcg")) - disc(1)) < 2e-6)
    assert(r.getDouble(r.fieldIndex("ndcg")) == 1.0)
  }
}
