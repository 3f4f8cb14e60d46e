package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import functions.VectorMath

/** The native fused CosineSimilarity expression must be bitwise-equal
  * to the composable zip_with/aggregate form (same fold order), and be
  * reachable from SQL via the Engine's SparkSessionExtensions. */
class CosineSimilaritySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  test("fused expression == composable fold, bitwise, across the corpus") {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(2000)
      .select(
        VectorMath.cosine(col("a.v"), col("b.v")).as("composable"),
        VectorMath.cosineFast(col("a.v"), col("b.v")).as("fused"))
    // bitwise equality: no tolerance
    assert(pairs.filter(col("composable") =!= col("fused")).count() == 0)
  }

  test("cosine_sim is registered for SQL use") {
    Tables.embeddings(spark, dir)
      .select(col("embedding").cast("array<double>").as("v"))
      .limit(1).createOrReplaceTempView("one_vec")
    val r = spark.sql("SELECT cosine_sim(v, v) AS c FROM one_vec").head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12) // self-cosine is 1
  }

  test("mismatched-length and null-element inputs yield null, same as the composable form") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)),       // length mismatch
      (Seq(1.0, 2.0), Seq(1.0, 2.0))              // control: valid
    ).toDF("a", "b")
    val out = df.select(
      VectorMath.cosineFast(col("a"), col("b")).as("fused"),
      VectorMath.cosine(col("a"), col("b")).as("composable")).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1)) // both null on mismatch
    assert(!out(1).isNullAt(0) && out(1).getDouble(0) == out(1).getDouble(1))
  }

  test("interpreted eval path agrees with codegen") {
    val emb = Tables.embeddings(spark, dir)
      .select(col("embedding").cast("array<double>").as("v")).limit(10).collect()
    val vecs = emb.map(_.getSeq[Double](0).toArray)
    import functions.expressions.CosineSimilarity
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = Literal.create(vecs(0), org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val b = Literal.create(vecs(1), org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val interp = CosineSimilarity(a, b).eval(null).asInstanceOf[Double]
    def dot(x: Array[Double], y: Array[Double]) = x.zip(y).map(p => p._1 * p._2).sum
    val expect = dot(vecs(0), vecs(1)) /
      (math.sqrt(dot(vecs(0), vecs(0))) * math.sqrt(dot(vecs(1), vecs(1))))
    assert(math.abs(interp - expect) < 1e-12)
  }
}
