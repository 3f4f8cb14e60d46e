package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import dedup.Spans

/** Substring-span dedup invariants. Value-level equivalence vs DuckDB
  * runs through graft.Verify + tools/verify_local.py. */
class SpansSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("q62 groupBy+semi-join plan equals the per-key window formulation") {
    // reference: the skew-UNSAFE window count the operator replaced —
    // output must be byte-identical
    import Spans.SpanTokens
    val docs = Tables.documents(spark, dir)
    val L = SpanTokens
    val grams = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= L)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), size(col("w")) - lit(L - 1)),
          i => functions.Hashing.hash48(concat_ws(" ", slice(col("w"), i, lit(L)))))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("k"))
    val occ = W.partitionBy(col("k"))
    val island = W.partitionBy(col("doc_id")).orderBy(col("pos"))
    val ref = grams
      .withColumn("n_occ", count(lit(1)).over(occ))
      .filter(col("n_occ") >= 2)
      .withColumn("grp", col("pos") - row_number().over(island))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("start_tok"),
        (max(col("pos")) + lit(L - 1)).as("end_tok"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("start_tok"), col("end_tok"), col("n_windows"))
    val got = Spans.dupSpans(docs)
    assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0)
    assert(got.count() > 0)
  }

  test("q62 plan audit: no window partitioned by the gram key") {
    // the r5 verdict's scale-killer: the occurrence count must be a
    // hash aggregate, leaving the island window (by doc_id) as the
    // ONLY window in the plan
    val plan = Spans.dupSpans(spark, dir).queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.length == 1, s"expected 1 window (islands), got ${windows.length}")
    val parts = windows.head.partitionSpec.flatMap(_.references.map(_.name)).distinct
    assert(parts == Seq("doc_id"), s"island window must partition by doc_id, got $parts")
  }

  test("q63 planted boilerplate: later occurrence excised, first kept, counts reconcile") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ") // 10 shared tokens
    val docs = Seq(
      (1L, s"alpha beta $boiler gamma"),
      (2L, s"delta $boiler epsilon zeta"),
      (3L, "unrelated words only here nothing repeats at all")
    ).toDF("doc_id", "text")
    val out = Spans.removeDupSpans(docs).cache()
    val m = out.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1 holds the first occurrence (smallest doc_id) — fully kept
    assert(m(1L) == ((13L, 0L, s"alpha beta $boiler gamma")))
    // doc 2 loses exactly the 10 boilerplate tokens
    assert(m(2L) == ((13L, 10L, "delta epsilon zeta")))
    // doc 3: too-short-window-free text untouched
    assert(m(3L)._2 == 0L && m(3L)._3 == "unrelated words only here nothing repeats at all")
  }

  test("q63 corpus: every doc present, token counts reconcile with clean_text") {
    val docs = Tables.documents(spark, dir)
    val out = Spans.removeDupSpans(docs).cache()
    assert(out.count() == docs.count())
    assert(out.filter(col("n_removed") > 0).count() > 0) // planted dups exist
    // kept token count equals clean_text's token count (docs stripped
    // to nothing excluded: split("") yields [""], not [])
    val bad = out.filter(col("n_removed") < col("n_tokens") &&
      size(split(col("clean_text"), " ")) =!= col("n_tokens") - col("n_removed"))
    assert(bad.count() == 0)
    // original token count matches the source
    val orig = docs.select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    assert(out.join(orig, "doc_id")
      .filter(col("n_tokens") =!= col("n")).count() == 0)
  }

  test("q63 removal region is inside q62's reported span coverage") {
    // q62 reports union coverage of ALL duplicated windows; q63 removes
    // only non-first occurrences — so per doc, removed ≤ q62 coverage
    val docs = Tables.documents(spark, dir)
    val spans = Spans.dupSpans(docs)
      .groupBy("doc_id")
      .agg(sum(col("end_tok") - col("start_tok") + 1).as("span_cov"))
    val joined = Spans.removeDupSpans(docs)
      .join(spans, Seq("doc_id"), "left")
      .withColumn("cov", coalesce(col("span_cov"), lit(0L)))
    assert(joined.filter(col("n_removed") > col("cov")).count() == 0)
  }
}
