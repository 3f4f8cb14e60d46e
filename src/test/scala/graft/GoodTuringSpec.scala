package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import textstats.GoodTuring

/** Good–Turing / Chao1 invariants (q154) and filtered-ANN invariants
  * (q155). Cross-engine parity runs through the oracle gate. */
class GoodTuringSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  import spark.implicits._

  test("hand-computed corpus: N, V, n1, n2, P0, Chao1 all exact") {
    // "a a a b b c d" → N=7, V=4, n1=2 (c,d), n2=1 (b),
    // P0 = 2/7, Chao1 = 4 + 4/2 = 6
    val docs = Seq(("g", "a a a b b c d")).toDF("source", "text")
    val r = GoodTuring.goodTuring(docs, "source", "text").collect().head
    assert(r.getLong(r.fieldIndex("n_tokens")) == 7L)
    assert(r.getLong(r.fieldIndex("vocab")) == 4L)
    assert(r.getLong(r.fieldIndex("n1")) == 2L)
    assert(r.getLong(r.fieldIndex("n2")) == 1L)
    assert(r.getDouble(r.fieldIndex("p_unseen")) == 0.285714)
    assert(r.getDouble(r.fieldIndex("chao1")) == 6.0)
  }

  test("no doubletons: Chao1 is NULL, not infinite") {
    val docs = Seq(("g", "x y z x x")).toDF("source", "text")
    val r = GoodTuring.goodTuring(docs, "source", "text").collect().head
    assert(r.getLong(r.fieldIndex("n2")) == 0L)
    assert(r.isNullAt(r.fieldIndex("chao1")))
    assert(r.getDouble(r.fieldIndex("p_unseen")) == 0.4) // y, z of 5
  }

  test("a saturated source reports lower unseen mass than a diverse one") {
    val docs = Seq(
      ("rep", Seq.fill(200)("the same ten words repeat forever and ever again now").mkString(" ")),
      ("div", (1 to 400).map(i => s"tok$i").mkString(" "))).toDF("source", "text")
    val m = GoodTuring.goodTuring(docs, "source", "text").collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("p_unseen"))).toMap
    assert(m("rep") < 0.01 && m("div") == 1.0, s"$m")
  }

  test("q155 filtered ANN: every neighbor is cross-source, ranks exact") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = ann.Ann.annIvfFiltered(spark, dir)
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val joined = out
      .join(src.withColumnRenamed("doc_id", "query_id")
        .withColumnRenamed("source", "qsource"), "query_id")
      .join(src.withColumnRenamed("doc_id", "neighbor_id"), "neighbor_id")
    assert(joined.filter(col("source") === col("qsource")).count() == 0,
      "a same-source neighbor leaked through the filter")
    // ranks are 1..m per query with no gaps, m ≤ TopK
    val perQ = out.groupBy("query_id")
      .agg(count(lit(1)).as("m"), max(col("rk")).as("mx"))
    assert(perQ.filter(col("m") =!= col("mx") ||
      col("m") > ann.Ann.TopK).count() == 0)
    // and the filtered result is a subset of what scoring the same
    // probed cells WITHOUT the predicate would allow (sanity: the
    // filter only removes candidates, never invents them)
    val unfiltered = ann.Ann.annIvf(spark, dir)
      .select("query_id").distinct().collect().map(_.getLong(0)).toSet
    val filteredQ = out.select("query_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(filteredQ.subsetOf(unfiltered))
  }
}
