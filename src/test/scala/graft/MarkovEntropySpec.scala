package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.MarkovEntropy

/** Markov entropy rate (q191): deterministic-chain zero, uniform-chain
  * maximum, a hand-computed mixed matrix, and the info-gain identity.
  * Value-level oracle equivalence runs through graft.Verify. */
class MarkovEntropySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def h(rows: Seq[(String, String, Long)]) = {
    import spark.implicits._
    MarkovEntropy.entropyRate(rows.toDF("a", "b", "n").repartition(3))
      .collect().head
  }

  test("deterministic alternation: H = 0, perplexity = 1, gain = H₀") {
    val r = h(Seq(("A", "B", 4L), ("B", "A", 4L)))
    assert(r.getDouble(r.fieldIndex("h_cond_bits")) == 0.0)
    assert(r.getDouble(r.fieldIndex("perplexity")) == 1.0)
    assert(r.getDouble(r.fieldIndex("h_marg_bits")) == 1.0) // 50/50 marginal
    assert(r.getDouble(r.fieldIndex("info_gain")) == 1.0)
  }

  test("uniform 2-state chain: H = 1 bit, perplexity = 2, gain = 0") {
    val r = h(Seq(("A", "A", 2L), ("A", "B", 2L), ("B", "A", 2L),
      ("B", "B", 2L)))
    assert(r.getDouble(r.fieldIndex("h_cond_bits")) == 1.0)
    assert(r.getDouble(r.fieldIndex("perplexity")) == 2.0)
    assert(r.getDouble(r.fieldIndex("info_gain")) == 0.0)
  }

  test("hand case: H and H₀ from the exact cell terms") {
    val r = h(Seq(("A", "A", 3L), ("A", "B", 1L), ("B", "A", 2L),
      ("B", "B", 2L)))
    def lg(x: Double) = math.log(x) / math.log(2.0)
    val expH = -(3.0 / 8 * lg(3.0 / 4) + 1.0 / 8 * lg(1.0 / 4)
      + 2.0 / 8 * lg(2.0 / 4) + 2.0 / 8 * lg(2.0 / 4))
    val expH0 = -(5.0 / 8 * lg(5.0 / 8) + 3.0 / 8 * lg(3.0 / 8))
    assert(math.abs(r.getDouble(r.fieldIndex("h_cond_bits")) - expH) < 2e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("h_marg_bits")) - expH0) < 2e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("info_gain"))
      - (expH0 - expH)) < 4e-6)
    assert(r.getLong(r.fieldIndex("n_transitions")) == 8L)
    assert(r.getLong(r.fieldIndex("k_states")) == 2L)
  }

  test("conditioning never hurts: info_gain ≥ 0 on a skewed matrix") {
    val r = h(Seq(("A", "A", 9L), ("A", "B", 1L), ("B", "A", 1L),
      ("B", "B", 9L), ("C", "A", 5L), ("C", "C", 5L)))
    assert(r.getDouble(r.fieldIndex("info_gain")) >= 0.0)
    assert(r.getLong(r.fieldIndex("k_states")) == 3L)
  }
}
