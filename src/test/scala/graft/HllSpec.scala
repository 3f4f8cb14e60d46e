package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import operators.Hll

/** HyperLogLog sketch (q245): bit-exact parity with a driver-side
  * reference over the identical hash/register/estimate program,
  * set semantics, the distributed merge identity, accuracy bands on
  * both the raw and linear-counting branches, and the registered
  * per-return-flag audit. Value-level oracle equivalence runs through
  * graft.Verify. */
class HllSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def rowsOf(ks: Seq[String], g: String = "g1") = {
    import spark.implicits._
    ks.map((g, _)).toDF("g", "k")
  }

  /** Reference: the same register program on JVM primitives. */
  private def refHll(ks: Seq[String]): Double = {
    val regs = new Array[Int](256)
    ks.foreach { k =>
      val h = java.lang.Long.parseLong(
        functions.Hashing.md5hex(k).substring(0, 12), 16)
      val b = (h >>> 40).toInt
      val w = h & (Hll.W2 - 1)
      val rho =
        if (w == 0L) 41
        else 41 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(b)) regs(b) = rho
    }
    val v = regs.count(_ == 0)
    val s = regs.map(r => 1L << (41 - r)).sum
    val raw = 1.0351398986589102e17 / s.toDouble // the pinned NumSql
    if (raw <= 640.0 && v > 0)
      256.0 * (math.floor(math.log(256.0 / v) * 1e9 + 0.5) / 1e9)
    else raw
  }
  private def est(ks: Seq[String]): Double =
    Hll.sketch(rowsOf(ks)).collect().head.getDouble(3)

  test("round-4 parity with the JVM reference on both branches") {
    val big = (1 to 3000).map(i => s"key-$i")   // raw branch
    val small = (1 to 30).map(i => s"key-$i")   // linear counting
    Seq(big, small).foreach { ks =>
      val got = BigDecimal(est(ks)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      val want = BigDecimal(refHll(ks)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      assert(got == want, s"n=${ks.size}")
    }
  }

  test("set semantics: duplicates never move the estimate") {
    val ks = (1 to 500).map(i => s"dup-$i")
    assert(est(ks) == est(ks ++ ks ++ ks.take(77)))
  }

  test("merge identity: sketch(A ∪ B) == estimate(merged(regs))") {
    val a = (1 to 400).map(i => s"a-$i")
    val b = (300 to 700).map(i => s"a-$i") // overlapping
    val direct = est(a ++ b)
    val viaMerge = Hll.estimate(
      Hll.merged(Hll.registers(rowsOf(a)), Hll.registers(rowsOf(b))))
      .collect().head.getDouble(3)
    assert(direct == viaMerge)
  }

  test("accuracy: |rel err| within ~3σ of 1.04/√256 on 5000 keys") {
    val n = 5000
    val e = est((1 to n).map(i => s"acc-$i"))
    assert(math.abs(e - n) / n < 0.2, s"est $e")
  }

  test("linear-counting branch is near-exact at tiny cardinality") {
    val n = 30
    val e = est((1 to n).map(i => s"lc-$i"))
    assert(math.abs(e - n) / n < 0.2, s"est $e")
  }

  test("groups are independent") {
    import spark.implicits._
    val rows = ((1 to 300).map(i => ("g1", s"x-$i")) ++
      (1 to 40).map(i => ("g2", s"x-$i"))).toDF("g", "k")
    val m = Hll.sketch(rows).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(m("g1") == est((1 to 300).map(i => s"x-$i")))
    assert(m("g2") == est((1 to 40).map(i => s"x-$i")))
  }

  test("registered q245 at sf0.001: 3 flags, sketch within the band") {
    val rows = Hll.orderkeyHll(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val err = r.getDouble(r.fieldIndex("rel_err"))
      assert(math.abs(err) < 0.2, s"rel_err $err")
      assert(r.getLong(r.fieldIndex("n_exact")) > 0)
    }
  }

  test("q261 composition: planted cardinality step peaks PH at the step month") {
    import spark.implicits._
    // 12 months: months 0-5 have ~40 distinct keys, months 6-11 have
    // ~400 - the upward-drift evidence must peak where the regime
    // turns (the PH walk's minimum is at the last small month)
    val rows = (0 until 12).flatMap { t =>
      val n = if (t < 6) 40 else 400
      (1 to n).map(i => ("A", t.toLong, s"k-$t-$i"))
    }.toDF("g", "t", "k0")
    val keyed = rows.selectExpr("concat(g, ':', CAST(t AS STRING)) AS g", "k0 AS k")
    val series = Hll.sketch(keyed).selectExpr(
      "split(g, ':')[0] AS g", "CAST(split(g, ':')[1] AS BIGINT) AS t",
      "CAST(floor(hll_est * 1e6 + 5e-1) AS BIGINT) AS x")
    val ph = operators.PageHinkley.pageHinkley(series).collect()
    assert(ph.length == 1)
    val r = ph(0)
    // the retrospective centered walk declines through the low regime
    // (min at the last small month) then climbs to 0: the drawup peaks
    // at the END, the drawdown at the STEP, and with 6 rising vs 5
    // falling segments the upward side carries the larger evidence
    assert(r.getLong(r.fieldIndex("up_day")) == 11L,
      "drawup must peak at the series end after a level step")
    assert(r.getLong(r.fieldIndex("down_day")) == 5L,
      "drawdown must peak at the last pre-step month")
    assert(r.getDouble(r.fieldIndex("ph_up")) >
      r.getDouble(r.fieldIndex("ph_down")),
      "step-up series must carry more upward than downward evidence")
  }

  test("registered q261 at sf0.001: one row per flag, months counted") {
    val rows = Hll.shipMonthHllDrift(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_buckets")) > 12,
        "monthly series should span years of ship dates")
      assert(r.getDouble(r.fieldIndex("ph_up")) >= 0.0)
      assert(r.getDouble(r.fieldIndex("ph_down")) >= 0.0)
    }
  }

  test("q262 set algebra: planted identical and disjoint sets bracket the overlap") {
    import spark.implicits._
    def overlapEst(rowsA: Seq[String], rowsB: Seq[String]): Double = {
      val rows = (rowsA.map(("A", _)) ++ rowsB.map(("B", _))).toDF("g", "k")
      val regs = Hll.registers(rows)
      val members = Seq(("A|B", "A"), ("A|B", "B")).toDF("pair", "g")
      val ea = Hll.sketch(rows.filter($"g" === "A")).collect()(0).getDouble(3)
      val eb = Hll.sketch(rows.filter($"g" === "B")).collect()(0).getDouble(3)
      val eu = Hll.estimate(regs.join(members, "g")
        .groupBy($"pair".as("g"), $"b")
        .agg(org.apache.spark.sql.functions.expr("CAST(max(r) AS BIGINT)").as("r")))
        .collect()(0).getDouble(3)
      ea + eb - eu
    }
    val ks = (1 to 500).map(i => s"key-$i")
    // identical sets: overlap estimate ≈ the set size
    val same = overlapEst(ks, ks)
    assert(math.abs(same - 500) / 500 < 0.2, s"identical-set overlap $same")
    // disjoint sets: overlap ≈ 0 relative to the union
    val disj = overlapEst(ks, (1 to 500).map(i => s"other-$i"))
    assert(math.abs(disj) / 1000 < 0.2, s"disjoint-set overlap $disj")
  }

  test("registered q262 at sf0.001: one row per flag pair, exact beside sketch") {
    val rows = Hll.flagOverlapHll(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_exact_overlap")) > 0)
      // inclusion-exclusion stays tight relative to the UNION universe
      assert(math.abs(r.getDouble(r.fieldIndex("rel_err_union"))) < 0.25)
    }
  }
}
