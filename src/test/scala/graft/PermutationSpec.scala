package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import operators.Permutation

/** Randomization-test invariants (q150). Cross-engine value parity
  * runs through the oracle gate; here: the test's operating
  * characteristics on planted data — power under a real effect,
  * level under a hash-null — plus determinism and a driver recompute
  * of one resample. */
class PermutationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  import spark.implicits._

  private def runOn(rows: Seq[(Long, String, Double)], b: Int = Permutation.B) = {
    // run the operator body against a synthetic orders frame by
    // shaping it like the table the registered query reads
    val df = rows.toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val tmp = java.nio.file.Files.createTempDirectory("graft-perm").toString
    df.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    // the other tables aren't touched by this operator
    Permutation.orderPricePermTest(spark, tmp, b).collect().head
  }

  test("planted strong effect: p collapses to the 1/(B+1) floor") {
    val rows = (1L to 400L).map { k =>
      if (k % 2 == 0) (k, "F", 1000.0 + (k % 7).toDouble)
      else (k, "O", 10.0 + (k % 7).toDouble)
    }
    val r = runOn(rows)
    val p = r.getDouble(r.fieldIndex("p_value"))
    assert(p <= 0.01, s"planted effect not detected: p = $p")
    assert(r.getLong(r.fieldIndex("n_extreme")) == 0L)
  }

  test("hash-null (labels independent of value): p stays off the floor") {
    // labels from an md5 of the key, values independent of them
    val rows = (1L to 400L).map { k =>
      val lbl = if (graft.functions.Hashing.md5hex(s"n:$k")(0) < '8') "F" else "O"
      (k, lbl, 500.0 + ((k * 13) % 97).toDouble)
    }
    val r = runOn(rows)
    val p = r.getDouble(r.fieldIndex("p_value"))
    // a null p is ~uniform: any single deterministic draw can land
    // anywhere in (0, 1] — the assertable property is that it does NOT
    // collapse to the 1/(B+1) floor a genuine effect produces
    assert(p > 2.0 / (Permutation.B + 1), s"null case at the floor: p = $p")
    assert(r.getLong(r.fieldIndex("n_extreme")) >= 1L)
  }

  test("deterministic: identical p across runs; B controls resolution") {
    val rows = (1L to 200L).map(k =>
      (k, if (k % 3 == 0) "F" else "O", 100.0 + (k % 13).toDouble))
    val a = runOn(rows)
    val b = runOn(rows)
    assert(a.toSeq == b.toSeq)
    val small = runOn(rows, b = 49)
    assert(small.getLong(small.fieldIndex("n_resamples")) == 49L)
  }

  test("one resample's sums match a driver recompute of the relabel rule") {
    val dir = "/root/testdata/sf0.001"
    val rows = Tables.orders(spark, dir)
      .filter(col("o_totalprice").isNotNull &&
        col("o_orderstatus").isin("F", "O"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val nA = rows.count(_._2 == "F").toLong
    val n = rows.length.toLong
    // driver recompute of resample b = 7 via the JVM md5 twin
    def h48(s: String) = java.lang.Long.parseLong(
      graft.functions.Hashing.md5hex(s).substring(0, 12), 16)
    val (psa, pna) = rows.foldLeft((0L, 0L)) { case ((s, c), (k, _, xc)) =>
      if (h48(s"${Permutation.Seed}:7:$k") % n < nA) (s + xc, c + 1) else (s, c)
    }
    // the operator's per-b frame, surfaced through a tiny local rerun
    val perB = Tables.orders(spark, dir)
      .filter(col("o_totalprice").isNotNull &&
        col("o_orderstatus").isin("F", "O"))
      .select(col("o_orderkey").as("k"),
        expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)").as("xc"))
      .withColumn("h", graft.functions.Hashing.hash48(Permutation.Seed,
        concat(lit("7:"), col("k").cast("string"))))
      .withColumn("inA", (col("h") % lit(n) < lit(nA)).cast("int"))
      .agg(sum(expr("CASE WHEN inA = 1 THEN xc ELSE 0 END")).as("psa"),
        sum(col("inA")).cast("long").as("pna"))
      .head()
    assert(perB.getLong(0) == psa && perB.getLong(1) == pna)
  }
}
