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
}
