package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** sum128 (exact int128 fixed-point sum): bit-for-bit equivalence with
  * sum(CAST(v AS DECIMAL(38,0))) on signed/large/adversarial inputs,
  * beyond-Long.MAX totals (the reason it exists), SQL NULL semantics,
  * and cross-partition merge. The live call sites are q164/q166's IRLS
  * sufficient statistics (QuantileRegression.sum128Sql). */
class SumInt128Spec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def both(df: org.apache.spark.sql.DataFrame,
      groupCol: Option[String]): Unit = {
    val (fast, ref) = groupCol match {
      case Some(g) =>
        (df.groupBy(g).agg(expr("sum128(v)").as("s")).orderBy(g),
          df.groupBy(g).agg(expr("CAST(sum(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("s")).orderBy(g))
      case None =>
        (df.agg(expr("sum128(v)").as("s")),
          df.agg(expr("CAST(sum(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("s")))
    }
    val (f, r) = (fast.collect(), ref.collect())
    assert(f.length == r.length)
    f.zip(r).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq, s"sum128 ${a.toSeq} != decimal sum ${b.toSeq}")
    }
    // and the result type matches the decimal-sum idiom exactly
    assert(fast.schema("s").dataType == ref.schema("s").dataType)
  }

  test("equals the decimal sum on mixed-sign values, grouped and global") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val df = (1 to 20000).map(i =>
      (i % 7, rnd.nextLong() / 1000 * (if (i % 3 == 0) -1 else 1)))
      .toDF("g", "v").repartition(32)
    both(df, Some("g"))
    both(df, None)
  }

  test("totals beyond Long.MAX stay exact (the overflow case BIGINT sum cannot do)") {
    import spark.implicits._
    // 4000 × (Long.MAX/2) ≈ 1.8e22 — 2000× past 2^63
    val df = (1 to 4000).map(i => (1, Long.MaxValue / 2 + i))
      .toDF("g", "v").repartition(16)
    both(df, Some("g"))
    val got = df.agg(expr("sum128(v)")).head.getDecimal(0)
    val want = (BigInt(Long.MaxValue / 2) * 4000 + (1 to 4000).map(BigInt(_)).sum)
    assert(BigInt(got.toBigInteger) == want)
  }

  test("deep-negative totals: carry/sign-extension path") {
    import spark.implicits._
    val df = (1 to 4000).map(i => (1, Long.MinValue / 2 - i))
      .toDF("g", "v").repartition(16)
    both(df, Some("g"))
    val got = df.agg(expr("sum128(v)")).head.getDecimal(0)
    val want = BigInt(Long.MinValue / 2) * 4000 - (1 to 4000).map(BigInt(_)).sum
    assert(BigInt(got.toBigInteger) == want)
  }

  test("adversarial limb edges: MIN/MAX/-1/0/1 multiset") {
    import spark.implicits._
    val vals = Seq(Long.MinValue, Long.MaxValue, -1L, 0L, 1L,
      Long.MinValue, Long.MaxValue, -1L, -1L, 1L)
    val df = vals.map((1, _)).toDF("g", "v").repartition(8)
    both(df, Some("g"))
    val got = df.agg(expr("sum128(v)")).head.getDecimal(0)
    assert(BigInt(got.toBigInteger) == vals.map(BigInt(_)).sum)
  }

  test("NULL semantics match SQL sum: nulls skipped, all-null/empty → NULL") {
    import spark.implicits._
    val df = Seq((1, Some(5L)), (1, None), (2, None), (1, Some(7L)))
      .toDF("g", "v")
    both(df, Some("g"))
    val r = df.groupBy("g").agg(expr("sum128(v)").as("s")).orderBy("g").collect()
    assert(BigInt(r(0).getDecimal(1).toBigInteger) == 12)
    assert(r(1).isNullAt(1), "all-NULL group must yield NULL")
    val empty = df.filter(col("g") > 99)
    assert(empty.agg(expr("sum128(v)")).head.isNullAt(0))
  }

  test("non-BIGINT input is rejected at analysis") {
    import spark.implicits._
    val df = Seq(1.5, 2.5).toDF("v")
    val e = intercept[Exception](df.agg(expr("sum128(v)")).head)
    assert(e.getMessage.toLowerCase.contains("bigint")
      || e.getMessage.contains("sum128"))
  }
}
