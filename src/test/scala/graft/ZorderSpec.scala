package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Zorder

class ZorderSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("interleave matches a driver-side Morton reference") {
    import spark.implicits._
    def morton(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (i * 2)) | (((b >> i) & 1L) << (i * 2 + 1))
      }
    val pairs = for (a <- 0L to 16L; b <- 0L to 16L) yield (a, b)
    val got = pairs.toDF("a", "b")
      .withColumn("z", Zorder.interleave(Seq(col("a"), col("b")), 8))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == morton(a, b, 8), s"($a,$b)") }
  }

  test("z layout gives locality in BOTH dims; single-col sort does not") {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
    val parts = 32
    def touched(laidOut: org.apache.spark.sql.DataFrame,
        qlo: Long, qhi: Long): Long =
      laidOut.select(spark_partition_id().as("p"), col("l_suppkey"))
        .groupBy("p").agg(min("l_suppkey").as("lo"), max("l_suppkey").as("hi"))
        .filter(col("lo") <= qhi && col("hi") >= qlo)
        .count()
    // query box: all partkeys, suppkeys in a tight band
    val bySupp = touched(
      Zorder.layout(li, Seq("l_partkey", "l_suppkey"), parts), 3, 4)
    val byPart = touched(
      li.repartitionByRange(parts, col("l_partkey")), 3, 4)
    assert(byPart.toInt >= parts - 2) // partkey sort is blind to suppkey
    assert(bySupp < byPart / 2, s"z touched $bySupp vs $byPart")
  }

  test("zvalue is deterministic and dense-range normalized") {
    val li = Tables.lineitem(spark, dir)
    val a = Zorder.withZvalue(li, Seq("l_partkey", "l_suppkey"))
      .agg(min("_z"), max("_z")).head()
    val b = Zorder.withZvalue(li, Seq("l_partkey", "l_suppkey"))
      .agg(min("_z"), max("_z")).head()
    assert(a == b)
    assert(a.getLong(0) >= 0L)
    assert(a.getLong(1) < (1L << (2 * Zorder.Bits)))
  }
}
