package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import functions.expressions.KmvBuffer
import functions.Hashing
import operators.Kmv

/** KMV bottom-k sketch (q264): buffer dedup/capacity/merge laws,
  * ranked-selection equivalence against the oracle formulation,
  * sub-capacity exactness, estimator band, and the registered shape.
  * Value-level oracle equivalence runs through graft.Verify. */
class KmvSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  test("buffer: dedup, order, capacity") {
    val b = new KmvBuffer(3)
    Seq(5L, 1L, 5L, 9L, 1L, 0L, 7L).foreach(b.insert)
    assert(b.size == 3)
    assert(b.vs.take(3).toSeq == Seq(0L, 1L, 5L))
    b.insert(0L) // redelivery of a kept value: idempotent
    assert(b.vs.take(3).toSeq == Seq(0L, 1L, 5L))
    b.insert(2L) // better value evicts the tail
    assert(b.vs.take(3).toSeq == Seq(0L, 1L, 2L))
    b.insert(99L) // worse than every kept value at capacity: no-op
    assert(b.vs.take(3).toSeq == Seq(0L, 1L, 2L))
  }

  test("buffer: merge of split halves equals the whole (order-free)") {
    val xs = (0 until 500).map(i => ((i * 2654435761L) % 10007L))
    val whole = new KmvBuffer(16)
    xs.foreach(whole.insert)
    val (l, r) = xs.splitAt(137)
    val a = new KmvBuffer(16); l.foreach(a.insert)
    val b = new KmvBuffer(16); r.reverse.foreach(b.insert)
    (0 until b.size).foreach(i => a.insert(b.vs(i))) // the aggregate's merge
    assert(a.vs.take(a.size).toSeq == whole.vs.take(whole.size).toSeq)
  }

  test("sketch set equals the row_number-over-distinct selection") {
    import spark.implicits._
    val rows = (0 until 3000).map { i =>
      (if (i % 2 == 0) "A" else "B", s"key${i % 700}")
    }.toDF("g", "k")
      .withColumn("h", Hashing.hash48(org.apache.spark.sql.functions.col("k")))
      .repartition(8)
    val got = Kmv.bottomK(rows.select("g", "h"), 32)
      .selectExpr("g", "hs").as[(String, Seq[Long])].collect().toMap
    val want = rows.select("g", "h").distinct()
      .selectExpr("g", "h",
        "row_number() OVER (PARTITION BY g ORDER BY h) AS r")
      .filter("r <= 32").orderBy("g", "h")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(got == want)
  }

  test("sub-capacity group: the estimate IS the exact distinct count") {
    import spark.implicits._
    val rows = (0 until 400).map(i => ("G", s"k${i % 50}")).toDF("g", "k")
      .withColumn("h", Hashing.hash48(org.apache.spark.sql.functions.col("k")))
    val r = Kmv.bottomK(rows.select("g", "h"), 256)
      .selectExpr("sz", "hk").collect().head
    assert(r.getLong(0) == 50L)
    assert(r.isNullAt(1)) // never reached capacity
  }

  test("estimator lands inside the 1/sqrt(k-2) band on 20k distinct keys") {
    import spark.implicits._
    val rows = (0 until 20000).map(i => ("G", s"uid-$i")).toDF("g", "k")
      .withColumn("h", Hashing.hash48(org.apache.spark.sql.functions.col("k")))
      .repartition(16)
    val r = Kmv.bottomK(rows.select("g", "h"), 256)
      .selectExpr("CAST(hk AS DOUBLE) AS hkd").collect().head
    val est = 7.177611906121728e16 / (r.getDouble(0) + 1.0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.25) // ~4σ at 6.3%
  }

  test("q270 brackets: identical sets read J = 1, disjoint sets J = 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // identical: two groups over the same 600 keys; disjoint: no overlap
    def sketchOf(keys: Seq[String]) = {
      val df = keys.map(k => ("G", k)).toDF("g", "k")
        .select(col("g"), Hashing.hash48(col("k")).as("h"))
      Kmv.bottomK(df.distinct(), 64)
        .selectExpr("hs").as[Seq[Long]].collect().head
    }
    val a = sketchOf((0 until 600).map(i => s"x$i"))
    val b = sketchOf((0 until 600).map(i => s"x$i"))     // identical
    val c = sketchOf((0 until 600).map(i => s"y$i"))     // disjoint
    def jacc(p: Seq[Long], q: Seq[Long], k: Int): Double = {
      val u = (p ++ q).distinct.sorted.take(k)
      u.count(h => p.contains(h) && q.contains(h)).toDouble / u.size
    }
    assert(jacc(a, b, 64) == 1.0)
    assert(jacc(a, c, 64) == 0.0)
  }

  test("q270 registered shape: three flag pairs, error columns sane") {
    val df = Kmv.flagJaccardKmv(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 3)
    assert(df.columns.toSeq == Seq("flag_a", "flag_b", "n_int_exact",
      "n_union_exact", "jacc_exact", "jacc_kmv", "int_kmv", "err_jacc"))
    rows.foreach { r =>
      val jk = r.getDouble(r.fieldIndex("jacc_kmv"))
      assert(jk >= 0.0 && jk <= 1.0)
      assert(math.abs(r.getDouble(r.fieldIndex("err_jacc"))) < 0.2)
    }
  }

  test("registered shape: one row per return flag, both audits present") {
    val df = Kmv.orderkeyKmv(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 3)
    assert(df.columns.toSeq == Seq("l_returnflag", "n_exact",
      "kmv_estimate", "rel_err", "lines_mean_exact", "lines_mean_kmv"))
    rows.foreach { r =>
      assert(math.abs(r.getDouble(r.fieldIndex("rel_err"))) < 0.5)
      assert(r.getDouble(r.fieldIndex("lines_mean_exact")) >= 1.0)
      assert(r.getDouble(r.fieldIndex("lines_mean_kmv")) >= 1.0)
    }
  }
}
