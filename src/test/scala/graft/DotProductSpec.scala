package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import functions.VectorMath

/** The native fused DotProduct and SqDistance expressions (the r17
  * optimization round's codegen fix for the literal-projection hot
  * paths) must be bitwise-equal to the composable zip_with/aggregate
  * forms they replace — same strict left fold, same null propagation —
  * so every oracle hash over the PQ/OPQ/JL family is unchanged. */
class DotProductSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session()
  val dir = "/root/testdata/sf0.001"

  private def vecs = Tables.embeddings(spark, dir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("fused dot == composable fold, bitwise, across corpus pairs") {
    val emb = vecs
    val pairs = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(2000)
      .select(
        VectorMath.dotComposable(col("a.v"), col("b.v")).as("composable"),
        VectorMath.dot(col("a.v"), col("b.v")).as("fused"))
    assert(pairs.filter(col("composable") =!= col("fused")).count() == 0)
    assert(pairs.filter(col("fused").isNull).count() == 0)
  }

  test("fused sqDist == composable fold, bitwise, against a literal row") {
    val c = (0 until ann.Pq.SubDim).map(i => 0.1 * i - 0.3)
    val subs = vecs.select(slice(col("v"), 1, ann.Pq.SubDim).as("sv"))
      .select(
        ann.Pq.sqDistComposable(col("sv"), c).as("composable"),
        ann.Pq.sqDist(col("sv"), c).as("fused"))
    assert(subs.filter(col("composable") =!= col("fused")).count() == 0)
    assert(subs.filter(col("fused").isNull).count() == 0)
  }

  test("mismatched-length and null-element inputs yield null, like the HOF forms") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)), // length mismatch
      (Seq(1.0, 2.0), Seq(3.0, 4.0))       // control: valid
    ).toDF("a", "b")
    val out = df.select(
      VectorMath.dot(col("a"), col("b")).as("fused"),
      VectorMath.dotComposable(col("a"), col("b")).as("composable")).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(!out(1).isNullAt(0) && out(1).getDouble(0) == out(1).getDouble(1))
    assert(out(1).getDouble(0) == 1.0 * 3.0 + 2.0 * 4.0)
  }

  test("interpreted eval path agrees with codegen arithmetic") {
    import functions.expressions.{DotProduct, SqDistance}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val tpe = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    val xs = Array(0.5, -1.25, 3.75, 0.125)
    val ys = Array(2.0, 0.5, -0.25, 8.0)
    val a = Literal.create(xs, tpe)
    val b = Literal.create(ys, tpe)
    val d = DotProduct(a, b).eval(null).asInstanceOf[Double]
    val s = SqDistance(a, b).eval(null).asInstanceOf[Double]
    var ed = 0.0; var es = 0.0
    for (i <- xs.indices) {
      ed += xs(i) * ys(i)
      val df0 = xs(i) - ys(i); es += df0 * df0
    }
    assert(d == ed && s == es) // exact: same fold order
  }
}
