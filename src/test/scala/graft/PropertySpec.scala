package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (scalacheck generators, batch-verified in one
  * Spark job each) for the primitives whose cross-engine determinism
  * everything else leans on. */
class PropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("JVM MessageDigest md5 == Spark md5 for arbitrary strings (hyperplane/coef parity)") {
    import spark.implicits._
    val strs = samples(Gen.asciiPrintableStr, 200).distinct
    val jvm = strs.map { s =>
      s -> java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }.toMap
    val viaSpark = strs.toDF("s").withColumn("h", md5(col("s")))
      .collect().map(r => r.getString(0) -> r.getString(1))
    viaSpark.foreach { case (s, h) => assert(jvm(s) == h, s"md5 mismatch for '$s'") }
  }

  test("hash48 stays within 48 bits and is deterministic across evaluations") {
    import spark.implicits._
    val strs = samples(Gen.alphaNumStr.suchThat(_.nonEmpty), 200).distinct
    val df = strs.toDF("s")
      .withColumn("h1", functions.Hashing.hash48(col("s")))
      .withColumn("h2", functions.Hashing.hash48(col("s")))
    assert(df.filter(col("h1") < 0 || col("h1") >= (1L << 48)).count() == 0)
    assert(df.filter(col("h1") =!= col("h2")).count() == 0)
  }

  test("native hash48 expression equals the composable md5/conv chain (incl. unicode)") {
    import spark.implicits._
    val strs = (samples(Gen.asciiPrintableStr, 300) ++
      Seq("", "héllo wörld", "日本語テキスト", "emoji 🎉🎊", "a\tb\nc")).distinct
    val df = strs.toDF("s")
      .withColumn("native", functions.Hashing.hash48(col("s")))
      .withColumn("composed", functions.Hashing.hash48Composable(col("s")))
    val bad = df.filter(col("native") =!= col("composed"))
    assert(bad.count() == 0, bad.collect().take(3).mkString(";"))
    // and through the SQL surface inside a lambda (the shingle path)
    val viaSql = Seq("x y z").toDF("text")
      .select(transform(split(col("text"), " "), t => call_function("hash48", t)).as("hs"))
      .head.getSeq[Long](0)
    val direct = Seq("x", "y", "z").map(s =>
      functions.expressions.Hash48.compute(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    assert(viaSql == direct)
  }

  test("cleanNumeric inverts comma-grouped formatting for arbitrary longs") {
    import spark.implicits._
    val nums = samples(Gen.chooseNum(0L, 999999999999L), 200).distinct
    val df = nums.toDF("n")
      .withColumn("formatted", format_number(col("n"), 0))
      .withColumn("cleaned", sources.CleaningCsv.cleanNumeric(col("formatted")))
    val bad = df.filter(col("cleaned").isNull || col("cleaned") =!= col("n").cast("double"))
    assert(bad.count() == 0)
    // dash/blank variants → null, never an error
    val dashes = Seq("–", "—", "-", "", "  ").toDF("formatted")
      .withColumn("cleaned", sources.CleaningCsv.cleanNumeric(col("formatted")))
    assert(dashes.filter(col("cleaned").isNotNull).count() == 0)
  }

  test("minhash universal family: estimated jaccard tracks true jaccard on random sets") {
    // pure-arithmetic check of the (a*h+b) mod p family used by q20:
    // signature agreement rate approximates true jaccard
    val p = dedup.Dedup.MinhashP
    val coefs = dedup.Dedup.MinhashCoefs
    val rng = new scala.util.Random(7)
    (1 to 10).foreach { _ =>
      val base = Set.tabulate(300)(_ => rng.nextLong().abs % p)
      val keep = base.filter(_ => rng.nextDouble() < 0.7)
      val other = keep ++ Set.tabulate(90)(_ => rng.nextLong().abs % p)
      val trueJ = (base & other).size.toDouble / (base | other).size
      val sigA = coefs.map { case (a, b) => base.map(h => (h * a + b) % p).min }
      val sigB = coefs.map { case (a, b) => other.map(h => (h * a + b) % p).min }
      val est = sigA.zip(sigB).count(t => t._1 == t._2).toDouble / coefs.size
      assert(math.abs(est - trueJ) <= 0.35, s"est $est far from true $trueJ")
    }
  }

  test("asofJoin matches an in-memory reference model on random interleavings") {
    import java.sql.Timestamp
    import spark.implicits._
    val gen = for {
      user <- Gen.chooseNum(1L, 5L)
      t <- Gen.chooseNum(0L, 100L)
      isState <- Gen.oneOf(true, false)
      v <- Gen.chooseNum(1, 999)
    } yield (user, t, isState, v.toDouble)
    val evs = samples(gen, 300)
    // right side unique per (user, t): keep the max value
    val states = evs.filter(_._3).groupBy(e => (e._1, e._2))
      .map { case ((u, t), g) => (u, t, g.map(_._4).max) }.toSeq
    val measures = evs.filterNot(_._3).zipWithIndex
      .map { case ((u, t, _, v), i) => (u, t, i.toLong, v) }
    // reference model: per measure, latest state at-or-before
    val expect = measures.map { case (u, t, id, _) =>
      val prior = states.filter(s => s._1 == u && s._2 <= t)
      id -> (if (prior.isEmpty) None else Some(prior.maxBy(_._2)))
    }.toMap
    val left = measures.map { case (u, t, id, v) => (u, new Timestamp(t * 1000), id, v) }
      .toDF("user_id", "ts", "event_id", "value")
    val right = states.map { case (u, t, v) => (u, new Timestamp(t * 1000), v) }
      .toDF("user_id", "state_ts", "state_value")
    val got = operators.AsOf.asofJoin(left, right, Seq("user_id"), "ts", "state_ts")
      .collect().map { r =>
        r.getLong(2) -> (if (r.isNullAt(4)) None
          else Some((r.getLong(0), r.getTimestamp(4).getTime / 1000, r.getDouble(5))))
      }.toMap
    assert(got.size == measures.size)
    expect.foreach { case (id, exp) =>
      assert(got(id) == exp, s"event $id: got ${got(id)}, expected $exp")
    }
  }

  test("separate round-trips arbitrary delimiter-joined pieces positionally") {
    import spark.implicits._
    val piece = Gen.alphaNumStr.suchThat(s => s.nonEmpty && s.length <= 8)
    val rowGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, piece))
    val rows = samples(rowGen, 120)
    val n = 6
    val df = rows.map(_.mkString("|")).toDF("s")
    val out = operators.Relational.separate(df, "s", "|", n).collect()
    rows.zip(out).foreach { case (pieces, r) =>
      (1 to n).foreach { i =>
        val expected = if (i <= pieces.length) pieces(i - 1) else null
        assert(r.getString(i) == expected,
          s"row '${pieces.mkString("|")}' part_$i: got ${r.getString(i)}")
      }
    }
  }

  test("stratified sampling rate concentrates near the target fraction") {
    import spark.implicits._
    val keys = (1L to 20000L).map(k => (k, "S")).toDF("k", "stratum")
    for (f <- Seq(0.05, 0.2, 0.5)) {
      val kept = operators.Sampling.stratified(keys, "k", "stratum", Map("S" -> f)).count()
      val rate = kept.toDouble / 20000
      assert(math.abs(rate - f) < 0.02, s"fraction $f sampled at $rate")
    }
  }

  test("welch t is invariant under affine shifts and flips sign when samples swap") {
    import spark.implicits._
    // quarter-step values: v and v+50 are exact binary doubles and
    // v*100 is an exact integer double, so the 1e2 snap is genuinely
    // lossless and the invariances hold EXACTLY at the round-4 output
    // grid (k/100.0 values are NOT exact — floor(v*1e2) can flip a
    // cent under a shift and move df by an output-grid step)
    val g = Gen.chooseNum(0, 20000).map(_ / 4.0)
    val a = samples(g, 40)
    val b = samples(g, 35)
    def t(xs: Seq[Double], ys: Seq[Double]): (Double, Double) = {
      val rows = xs.map(("g", "A", _)) ++ ys.map(("g", "B", _))
      val r = operators.Hypothesis
        .welchTTest(rows.toDF("g", "c", "x"), "g", "c", "A", "B", "x").head
      (r.getDouble(5), r.getDouble(6))
    }
    val (t0, df0) = t(a, b)
    // shift both samples by the same constant: t and df unchanged
    val (t1, df1) = t(a.map(_ + 50.0), b.map(_ + 50.0))
    assert(math.abs(t1 - t0) <= 1e-9 && math.abs(df1 - df0) <= 1e-9,
      s"shift broke invariance: ($t0,$df0) vs ($t1,$df1)")
    // swap the samples: t negates, df unchanged
    val (t2, df2) = t(b, a)
    assert(math.abs(t2 + t0) <= 1e-9 && math.abs(df2 - df0) <= 1e-9)
  }

  test("mann-whitney U identities: Ux + Uy = n1*n2, monotone-map invariance") {
    import spark.implicits._
    val g = Gen.chooseNum(1, 30).map(_.toDouble)
    val xs = samples(g, 50)
    val ys = samples(g, 45)
    def u(clsX: String, clsY: String, f: Double => Double): (Double, Double) = {
      val rows = xs.map(v => ("g", "X", f(v))) ++ ys.map(v => ("g", "Y", f(v)))
      val r = operators.Hypothesis
        .mannWhitneyU(rows.toDF("g", "c", "x"), "g", "c", clsX, clsY, "x").head
      (r.getDouble(3), if (r.isNullAt(4)) Double.NaN else r.getDouble(4))
    }
    val (ux, zx) = u("X", "Y", identity)
    val (uy, zy) = u("Y", "X", identity)
    // U-sum identity (exact — both U are integer multiples of 0.5)
    assert(ux + uy == xs.size.toDouble * ys.size,
      s"Ux + Uy = ${ux + uy} != ${xs.size * ys.size}")
    assert(math.abs(zx + zy) <= 2e-4, "z must negate under swap")
    // U depends only on order: any strictly monotone map preserves it
    val (um, zm) = u("X", "Y", v => v * v * v + 7.0)
    assert(um == ux && math.abs(zm - zx) <= 2e-4)
  }

  test("kendall S and tau match a brute-force pairwise recompute on random data") {
    import spark.implicits._
    // small value range forces heavy ties on both margins
    val g = Gen.zip(Gen.chooseNum(1, 8), Gen.chooseNum(1, 8))
      .map { case (x, y) => (x.toDouble, y.toDouble) }
    val pts = samples(g, 60)
    def sgn(d: Double): Int = if (d > 0) 1 else if (d < 0) -1 else 0
    val sRef = (for {
      i <- pts.indices; j <- pts.indices if i < j
    } yield sgn(pts(j)._1 - pts(i)._1) * sgn(pts(j)._2 - pts(i)._2)).sum
    def pairs(vs: Seq[Double]): Long = {
      val t = vs.groupBy(identity).values.map(_.size.toLong)
      t.map(c => c * (c - 1) / 2).sum
    }
    val n0 = pts.size.toLong * (pts.size - 1) / 2
    val tauRef = sRef / math.sqrt(
      (n0 - pairs(pts.map(_._1))).toDouble * (n0 - pairs(pts.map(_._2))))
    val r = operators.Correlation
      .kendallTauB(pts.toDF("x", "y"), "x", "y").head
    assert(r.getDouble(r.fieldIndex("s_stat")) == sRef.toDouble,
      s"S mismatch: ${r.getDouble(1)} vs $sRef")
    assert(math.abs(r.getDouble(r.fieldIndex("tau_b")) - tauRef) <= 1e-6)
    // monotone-map invariance: concordance is rank-only
    val m = operators.Correlation.kendallTauB(
      pts.map { case (x, y) => (x * x * x + 1, y * 7 - 3) }.toDF("x", "y"),
      "x", "y").head
    assert(m.getDouble(m.fieldIndex("s_stat")) == sRef.toDouble)
  }

  test("ks D bounds and monotone-map invariance on random samples") {
    import spark.implicits._
    val g = Gen.chooseNum(1, 25).map(_.toDouble)
    val xs = samples(g, 40)
    val ys = samples(g, 40)
    def d(f: Double => Double): Double = {
      val rows = xs.map(v => ("g", "X", f(v))) ++ ys.map(v => ("g", "Y", f(v)))
      operators.Hypothesis
        .ksTest(rows.toDF("g", "c", "x"), "g", "c", "X", "Y", "x")
        .head.getDouble(3)
    }
    val d0 = d(identity)
    assert(d0 >= 0.0 && d0 <= 1.0)
    // ECDF supremum is rank-only: strictly increasing maps preserve it
    assert(d(v => v * 2.0 + 3.0) == d0)
    // disjoint supports ⇒ D = 1 exactly
    val rows = xs.map(v => ("g", "X", v)) ++ ys.map(v => ("g", "Y", v + 1000.0))
    val d1 = operators.Hypothesis
      .ksTest(rows.toDF("g", "c", "x"), "g", "c", "X", "Y", "x")
      .head.getDouble(3)
    assert(d1 == 1.0)
  }

  test("BandedCumsum cumsum/rowNumber equal driver references on random frames") {
    import spark.implicits._
    val rows = samples(for {
      g <- Gen.oneOf("a", "b", "c", "d")
      k <- Gen.chooseNum(-100000L, 100000L)
      v <- Gen.chooseNum(-1000L, 1000L)
    } yield (g, k, v), 400).distinctBy(r => (r._1, r._2))
    val df = rows.toDF("g", "k", "v")
    for (bw <- Seq(1L, 7L, 1024L, 1L << 16)) {
      val got = operators.BandedCumsum.cumsum(df, Seq("g"), "k", Seq("v"), bw)
        .select("g", "k", "cum_v").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        val sorted = rs.sortBy(_._2)
        sorted.zip(sorted.map(_._3).scanLeft(0L)(_ + _).tail)
          .map { case ((_, k, _), c) => (g, k) -> c }
      }
      assert(got == want, s"bandWidth=$bw diverged from the driver reference")
    }
    // banded row_number over a DESC composite order with value collisions
    val got = operators.BandedCumsum.rowNumber(df, Seq("g"),
        expr("(-v) div 37"), Seq(col("v").desc, col("k")), "rn")
      .select("g", "k", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._3, r._2)).zipWithIndex
        .map { case ((_, k, _), i) => (g, k) -> (i + 1L) }
    }
    assert(got == want)
  }
}
