package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopK

/** [[graft.functions.expressions.BoundedTopK]] — the constant-state
  * shortlist election behind q151: exact set/order parity with the
  * row_number window it replaces (which is what the DuckDB oracles
  * still run), across shuffled partials so the serialize/merge path is
  * exercised, with ties decided by the same (score DESC, id ASC)
  * total order. */
class TopKSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()

  private def windowPick(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id"))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(2))).toSet
  }

  private def aggPick(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g").agg(TopK.topkIds(col("s"), col("id"), k).as("ids"))
      .select(col("g"), posexplode(col("ids")).as(Seq("p", "id")))
      .collect().map(r => (r.getLong(0), r.getInt(1) + 1, r.getLong(2))).toSet

  test("aggregate election == row_number window election, ties included") {
    import spark.implicits._
    // deterministic pseudo-random scores with PLANTED ties (s quantized
    // to a coarse grid) across several groups, shuffled into many
    // partitions so map-side partials must merge
    val rows = for {
      g <- 0L until 5L; i <- 0L until 400L
    } yield {
      val h = graft.functions.Hashing.derivedConst("topk", (g * 400 + i).toInt, 97, 0)
      (g, h.toDouble / 10.0, i)
    }
    val df = rows.toDF("g", "s", "id").repartition(13)
    for (k <- Seq(1, 7, 100)) {
      assert(aggPick(df, k) == windowPick(df, k), s"k=$k")
    }
  }

  test("k beyond the group size returns the whole group in rank order") {
    import spark.implicits._
    val df = Seq((1L, 2.0, 10L), (1L, 3.0, 11L), (1L, 2.0, 9L))
      .toDF("g", "s", "id").repartition(3)
    val got = df.groupBy("g")
      .agg(TopK.topkIds(col("s"), col("id"), 50).as("ids"))
      .select("ids").head.getSeq[Long](0)
    // order: 3.0 first, then the 2.0 tie broken toward the smaller id
    assert(got == Seq(11L, 9L, 10L))
  }

  test("null scores and ids are skipped, not elected") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double, java.lang.Long)](
      (1L, 5.0, 1L), (1L, null, 2L), (1L, 9.0, null), (1L, 4.0, 4L))
      .toDF("g", "s", "id")
    val got = df.groupBy("g")
      .agg(TopK.topkIds(col("s"), col("id"), 10).as("ids"))
      .select("ids").head.getSeq[Long](0)
    assert(got == Seq(1L, 4L))
  }

  test("NaN sorts as the LARGEST score (SQL order), ties by id") {
    import spark.implicits._
    // NaN rows must be elected FIRST (Spark/DuckDB ORDER BY s DESC
    // puts NaN above +Inf), with the id tie-break preserved among
    // NaNs — the r12 ADVICE case: raw > made NaN never-better, so a
    // full buffer dropped NaNs while a non-full one appended them
    // (merge-order-dependent). Shuffled partials exercise merge().
    val df = Seq(
      (1L, Double.NaN, 7L), (1L, Double.PositiveInfinity, 2L),
      (1L, Double.NaN, 3L), (1L, 5.0, 1L), (1L, -0.0, 8L), (1L, 0.0, 4L))
      .toDF("g", "s", "id").repartition(5)
    for (k <- Seq(2, 4, 6)) {
      assert(aggPick(df, k) == windowPick(df, k), s"k=$k")
    }
    val got = df.groupBy("g")
      .agg(TopK.topkIds(col("s"), col("id"), 4).as("ids"))
      .select("ids").head.getSeq[Long](0)
    // NaNs first (id order), then +Inf, then 5.0
    assert(got == Seq(3L, 7L, 2L, 1L))
  }
}
