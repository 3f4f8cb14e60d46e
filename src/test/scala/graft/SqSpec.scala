package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Sq

/** SQ8 scalar quantization (q346/q347): grid arithmetic, error bound,
  * and the recall floor on real testdata. */
class SqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("hand case: codes and decodes on a 2-dim fixture, zero-span dim constant") {
    import spark.implicits._
    // dim1 spans [0, 10], dim2 is constant 3.0 (zero span)
    val df = Seq(
      (0L, Seq(0.0, 3.0)), (1L, Seq(10.0, 3.0)), (2L, Seq(5.0, 3.0)))
      .toDF("vec_id", "embedding")
    val cb = Sq.fit(df)
    assert(cb.mn.toSeq == Seq(0.0, 3.0))
    assert(cb.span.toSeq == Seq(10.0, 0.0))
    val rec = df
      .select(col("vec_id"),
        Sq.reconstruct(col("embedding").cast("array<double>"), cb).as("rv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // min → code 0 → exact min; max → code 255 → mn + 255·sp/255
    assert(rec(0L) == Seq(0.0, 3.0))
    assert(rec(1L) == Seq(0.0 + 255.0 * 10.0 / 255.0, 3.0))
    // 5.0 → floor(5/10·255) = 127 → 127·10/255
    assert(rec(2L) == Seq(127.0 * 10.0 / 255.0, 3.0))
  }

  test("reconstruction error ≤ span/255 per dimension on the real corpus") {
    val emb = Tables.embeddings(spark, dir)
    val cb = Sq.fit(emb)
    // decode whole vectors, compare element-wise
    val rows = emb
      .select(col("embedding").cast("array<double>").as("v"),
        Sq.reconstruct(col("embedding").cast("array<double>"), cb).as("rv"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0); val rv = r.getSeq[Double](1)
      v.indices.foreach { j =>
        val bound = cb.span(j) / 255.0 * (1.0 + 1e-9) + 1e-12
        assert(math.abs(v(j) - rv(j)) <= bound,
          s"dim $j: |${v(j)} - ${rv(j)}| > $bound")
      }
    }
  }

  test("q347: SQ8 recall on testdata clears the compressed-family floor") {
    val row = Sq.docSqRecall(spark, dir).head()
    val recall = row.getDouble(row.fieldIndex("recall"))
    val worst = row.getDouble(row.fieldIndex("recall_worst"))
    // 8 bits per dimension is a fine grid — SQ8 should sit near the
    // top of the compressed families (IVF-PQ reads 0.80 here)
    assert(recall >= 0.9, s"SQ8 recall $recall below 0.9")
    assert(worst >= 0.8, s"SQ8 recall_worst $worst below 0.8")
  }

  test("two runs are identical (pure-function pipeline, no RNG)") {
    val a = Sq.annSq(spark, dir).collect().map(_.toSeq).toSet
    val b = Sq.annSq(spark, dir).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("persisted codebook round-trips and searches byte-identically") {
    val emb = Tables.embeddings(spark, dir)
    val cb = Sq.fit(emb)
    val path = java.nio.file.Files
      .createTempDirectory("sq_idx").toString + "/cb"
    graft.ann.IndexStore.saveSqCodebook(spark, cb, path)
    val cb2 = graft.ann.IndexStore.loadSqCodebook(spark, path)
    assert(cb2.mn.toSeq == cb.mn.toSeq && cb2.span.toSeq == cb.span.toSeq)
    val inline = Sq.annSqQueries(emb, graft.ann.Hnsw.strideQueries(emb), cb)
      .collect().map(_.toSeq).toSet
    val loaded = Sq.annSqQueries(emb, graft.ann.Hnsw.strideQueries(emb), cb2)
      .collect().map(_.toSeq).toSet
    assert(inline == loaded)
  }
}
