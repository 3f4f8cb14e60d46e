package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: squared L2 distance of two
  * array<double> columns in ONE fused loop — the [[CosineSimilarity]]
  * treatment for the PQ/k-means assignment metric.
  *
  * The composable form
  * (`aggregate(zip_with(a, b, (x,y) => (x−y)·(x−y)), 0.0, _+_)`) is a
  * CodegenFallback higher-order chain evaluated once per (row, cell)
  * pair — Ks·M = 128 interpreted evaluations per row in the PQ encode
  * projection and Ks per (row, m) in every Lloyd round, the measured
  * bulk of the q69-family encode cost.
  *
  * Accumulation is the same strict left fold
  * (`acc = 0.0; d = x−y; acc += d·d` in element order) as the
  * composable form and the oracle's unrolled `sqDistSql` text (every
  * term is ≥ 0 and +0.0 is an exact additive identity), so results are
  * bitwise-identical to both (pinned by DotProductSpec).
  */
case class SqDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Null when either input is null, the lengths mismatch, or any
    * consumed element is null — the composable form's propagation. */
  override def nullable: Boolean = true

  override def prettyName: String = "sq_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    if (xs.numElements() != ys.numElements()) return null
    val n = xs.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val d = xs.getDouble(i) - ys.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistance =
    copy(left = newLeft, right = newRight)
}
