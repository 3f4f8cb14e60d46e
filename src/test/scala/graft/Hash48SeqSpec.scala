package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hashing

/** Pins the [[graft.functions.expressions.Hash48Seq]] family expansion
  * to the composable per-pair form it replaces in the ×B resampling hot
  * paths (q150): element b of hash48Seq(seed, B, key) must equal
  * hash48(seed, concat(b, ":", key)) bit-for-bit — the q150 oracle
  * keeps the per-pair portable recipe, so this parity IS the bridge
  * between the fused batch path and the DuckDB twin. */
class Hash48SeqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  test("hash48Seq(seed, B, key)[b] == hash48(seed, b:key) for every b") {
    import spark.implicits._
    val keys = Seq("0", "7", "12345", "a key with spaces", "ünïcødé",
      "", "9223372036854775807")
    val df = keys.toDF("k")
    val b = 37
    val fused = df.select(col("k"),
      posexplode(Hashing.hash48Seq(150, b, col("k"))).as(Seq("b", "h")))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val perPair = df.select(col("k"),
      explode(sequence(lit(0), lit(b - 1))).as("b"))
      .withColumn("h", Hashing.hash48(150,
        concat(col("b").cast("string"), lit(":"), col("k"))))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(fused.size == keys.size * b)
    assert(fused == perPair)
  }

  test("distinct seeds give distinct families; values are 48-bit") {
    import spark.implicits._
    val df = Seq("x").toDF("k")
    def fam(seed: Int) = df.select(
      posexplode(Hashing.hash48Seq(seed, 16, col("k"))).as(Seq("b", "h")))
      .collect().map(_.getLong(1)).toSeq
    val f1 = fam(150); val f2 = fam(151)
    assert(f1 != f2)
    assert((f1 ++ f2).forall(h => h >= 0L && h < (1L << 48)))
  }
}
