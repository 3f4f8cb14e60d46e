package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("saltedJoin matches plain inner join row-for-row") {
    val fact = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    val dim = Tables.nation(spark, dir).select(col("n_nationkey").as("c_nationkey"), col("n_name"))
    val plain = fact.join(dim, Seq("c_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val salted = Skew.saltedJoin(fact, dim, "c_nationkey", buckets = 8)
      .select(col("c_custkey"), col("n_name"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin spreads a hot key across buckets") {
    val fact = Tables.orders(spark, dir)
      .select(col("o_orderkey"), lit(42).as("hot_key"))
    val dim = spark.range(1).select(lit(42).as("hot_key"), lit("x").as("payload"))
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col("o_orderkey"), col("hot_key")), lit(8)).cast("int"))
    val nSalts = salted.select("__salt").distinct.count()
    assert(nSalts == 8, s"hot key only spread over $nSalts salts")
    // and the join still yields every fact row exactly once
    assert(Skew.saltedJoin(fact, dim, "hot_key", 8).count() == fact.count())
  }
}
