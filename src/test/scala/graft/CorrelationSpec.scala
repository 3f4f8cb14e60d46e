package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Correlation

/** Correlation-matrix invariants. Value-level equivalence vs the DuckDB
  * twin runs through graft.Verify + tools/verify_local.py. */
class CorrelationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def facts(rows: Seq[(Double, Double, Double)]) = {
    import spark.implicits._
    rows.toDF("l_quantity", "l_discount", "l_tax")
  }

  test("perfect monotone relation: spearman = 1 even when pearson < 1") {
    // y = x^3 is monotone but nonlinear
    val xs = (1 to 20).map(_.toDouble)
    val out = Correlation.corrMatrix(
      facts(xs.map(x => (x, x * x * x / 1e4, 0.01))))
      .filter(col("var_a") === "quantity" && col("var_b") === "discount")
      .head()
    assert(out.getDouble(out.fieldIndex("spearman_rho")) == 1.0)
    assert(out.getDouble(out.fieldIndex("pearson_r")) < 1.0)
    assert(out.getDouble(out.fieldIndex("pearson_r")) > 0.8)
  }

  test("anti-monotone relation gives spearman = -1; ties are averaged") {
    val xs = (1 to 20).map(_.toDouble)
    val down = Correlation.corrMatrix(
      facts(xs.map(x => (x, (21 - x) / 1e3, 0.01))))
      .filter(col("var_a") === "quantity" && col("var_b") === "discount")
      .head()
    assert(down.getDouble(down.fieldIndex("spearman_rho")) == -1.0)
    // heavy ties: two levels of tax vs quantity — |rho| strictly < 1
    val tied = Correlation.corrMatrix(
      facts(xs.map(x => (x, x / 1e3, if (x <= 10) 0.01 else 0.05))))
      .filter(col("var_a") === "quantity" && col("var_b") === "tax")
      .head()
    val rho = tied.getDouble(tied.fieldIndex("spearman_rho"))
    assert(rho > 0.8 && rho < 1.0)
  }

  test("matches the textbook value on a fixed permutation example") {
    // x = 1..6 against the permutation (2,1,4,3,6,5):
    // ρ = 1 − 6·Σd²/(n(n²−1)) = 1 − 36/210 = 0.828571 → 0.8286; the
    // pearson over the affinely-scaled values is the same up to the
    // floor-snap's ±1 ulp on the inputs
    val rows = Seq(
      (1.0, 0.002, 0.01), (2.0, 0.001, 0.01), (3.0, 0.004, 0.01),
      (4.0, 0.003, 0.01), (5.0, 0.006, 0.01), (6.0, 0.005, 0.01))
    val out = Correlation.corrMatrix(facts(rows))
      .filter(col("var_a") === "quantity" && col("var_b") === "discount")
      .head()
    assert(out.getDouble(out.fieldIndex("spearman_rho")) == 0.8286)
    assert(math.abs(out.getDouble(out.fieldIndex("pearson_r")) - 0.8286) < 0.001)
  }

  test("kendall: classic no-tie permutation gives S = 6, tau = 0.6") {
    import spark.implicits._
    // x = 1..5 vs y = (2,1,4,3,5): C = 8, D = 2 → S = 6, n0 = 10
    val df = Seq((1.0, 2.0), (2.0, 1.0), (3.0, 4.0), (4.0, 3.0), (5.0, 5.0))
      .toDF("x", "y")
    val out = Correlation.kendallTauB(df, "x", "y").head()
    assert(out.getDouble(out.fieldIndex("s_stat")) == 6.0)
    assert(out.getDouble(out.fieldIndex("tau_b")) == 0.6)
    // no ties: var(S) = n(n-1)(2n+5)/18 = 50/3, z = 6/sqrt(50/3)
    assert(math.abs(out.getDouble(out.fieldIndex("z_tau")) - 1.4697) < 1e-9)
  }

  test("kendall: tie-corrected denominator on both margins") {
    import spark.implicits._
    // x = (1,1,2,2,3), y = (1,2,2,2,3): S = 6, Σt(t−1) = 4 (x), 6 (y)
    // → τb = 6/√((10−2)(10−3)) = 0.801784
    val df = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 2.0), (3.0, 3.0))
      .toDF("x", "y")
    val out = Correlation.kendallTauB(df, "x", "y").head()
    assert(out.getDouble(out.fieldIndex("s_stat")) == 6.0)
    assert(out.getDouble(out.fieldIndex("tau_b")) == 0.801784)
    assert(out.getLong(out.fieldIndex("n_rows")) == 5L)
  }

  test("kendall: monotone → 1, anti-monotone → −1, constant → NULL") {
    import spark.implicits._
    val xs = (1 to 20).map(_.toDouble)
    val up = Correlation.kendallTauB(
      xs.map(x => (x, x * x * x)).toDF("x", "y"), "x", "y").head()
    assert(up.getDouble(up.fieldIndex("tau_b")) == 1.0)
    val down = Correlation.kendallTauB(
      xs.map(x => (x, -x)).toDF("x", "y"), "x", "y").head()
    assert(down.getDouble(down.fieldIndex("tau_b")) == -1.0)
    val const = Correlation.kendallTauB(
      xs.map(x => (x, 7.0)).toDF("x", "y"), "x", "y").head()
    assert(const.isNullAt(const.fieldIndex("tau_b")))
    assert(const.getDouble(const.fieldIndex("s_stat")) == 0.0)
  }

  test("q101 shape: 3 pairs, n preserved, fact scanned once") {
    val li = Tables.lineitem(spark, dir)
    val out = Correlation.kendallMatrix(li).cache()
    assert(out.count() == 3)
    assert(out.select("n_rows").distinct().head().getLong(0) == li.count())
    // the triple grid is localCheckpointed: pair grids re-aggregate the
    // materialized cells, never the parquet fact
    val plan = Correlation.kendallMatrix(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"))
    assert(!plan.contains("parquet"))
    out.unpersist()
  }

  test("q106: confounder-driven association vanishes when partialled out") {
    // quantity and discount both driven by tax (the confounder) plus
    // independent deterministic "noise": raw r high, partial r ≈ 0
    val rows = (1 to 40).map { i =>
      val z = i.toDouble                   // confounder (tax)
      val nx = ((i * 37) % 11) - 5.0       // noise ⟂ z (period 11)
      val ny = ((i * 23) % 7) - 3.0        // noise ⟂ z (period 7)
      (z * 2 + nx, (z * 3 + ny) / 1e4, z / 1e2)
    }
    val out = Correlation.corrMatrix(facts(rows))
      .filter(col("var_a") === "quantity" && col("var_b") === "discount").head()
    val raw = out.getDouble(out.fieldIndex("pearson_r"))
    assert(raw > 0.95, s"confounded raw r should be high, got $raw")
    val part = Correlation.partialCorr(facts(rows))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val pqd = part(("quantity", "discount"))
    assert(pqd.getString(pqd.fieldIndex("ctrl")) == "tax")
    val pr = pqd.getDouble(pqd.fieldIndex("partial_r"))
    assert(math.abs(pr) < 0.3, s"partialling out tax should kill it, got $pr")
    // algebraic parity with the raw matrix: r_ab·c from the rounded
    // r's agrees with the operator to the rounding tolerance
    val m = Correlation.corrMatrix(facts(rows)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(r.fieldIndex("pearson_r"))).toMap
    val (rab, rac, rbc) =
      (m(("quantity", "discount")), m(("quantity", "tax")), m(("discount", "tax")))
    val want = (rab - rac * rbc) / math.sqrt((1 - rac * rac) * (1 - rbc * rbc))
    assert(math.abs(pr - want) < 5e-3, s"$pr vs recomputed $want")
  }

  test("q106: zero-variance control propagates NULL (undefined adjustment)") {
    // tax constant: r_qt and r_dt are NULL (q68 zero-variance rule) →
    // the (quantity, discount | tax) adjustment is undefined → NULL
    val rows = (1 to 20).map { i =>
      (i.toDouble, ((i * 7) % 5).toDouble / 1e4, 0.04)
    }
    val part = Correlation.partialCorr(facts(rows))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val pqd = part(("quantity", "discount"))
    assert(pqd.getString(pqd.fieldIndex("ctrl")) == "tax")
    assert(pqd.isNullAt(pqd.fieldIndex("partial_r")))
  }

  test("q68 shape: 3 pairs, n preserved by the rank joins, one scan") {
    val li = Tables.lineitem(spark, dir)
    val out = Correlation.corrMatrix(li).cache()
    assert(out.count() == 3)
    assert(out.select("n_rows").distinct().head().getLong(0) == li.count())
    // the 19-sum aggregate is localCheckpointed: the 3 matrix rows fan
    // out from the materialized 1-row RDD, so the fact is scanned once
    val plan = Correlation.corrMatrix(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("parquet")) // no re-scan in the fan-out
    out.unpersist()
  }
}
