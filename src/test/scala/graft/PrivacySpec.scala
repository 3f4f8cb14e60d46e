package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Privacy

/** Pseudonymization invariants. Value-level oracle equivalence runs
  * through graft.Verify. */
class PrivacySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("tokens are stable, salt-dependent, null-passing, and value-hiding") {
    import spark.implicits._
    val df = Seq(Some("alice"), Some("alice"), Some("bob"), None)
      .toDF("v")
    val t1 = df.select(Privacy.token(col("v"), "spec-salt").as("t")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(t1(0) == t1(1))               // stable: equal in, equal out
    assert(t1(0) != t1(2))               // distinct in, distinct out
    assert(t1(3) == null)                // null passes through
    assert(t1(0).length == 16 && t1(0) != "alice")
    val t2 = df.select(Privacy.token(col("v"), "other-salt").as("t"))
      .head.getString(0)
    assert(t2 != t1(0))                  // salt rotation breaks linkage
  }

  test("referential integrity survives tokenization: token join == clear join") {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    val clear = cust.join(ord, col("c_custkey") === col("o_custkey"))
      .groupBy("c_custkey").agg(count(lit(1)).as("n"))
    val tokens = Privacy.tokenJoin(spark, dir)
    assert(tokens.count() == clear.count())
    // per-customer order counts form the same multiset
    val a = clear.groupBy("n").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = tokens.groupBy("n_orders").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // no clear key or name leaks into the output
    assert(tokens.filter(length(col("token_custkey")) =!= 16).count() == 0)
    assert(tokens.filter(col("token_name").rlike("^Customer")).count() == 0)
  }
}
