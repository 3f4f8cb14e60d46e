package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two array<double>
  * columns in ONE fused loop — the [[CosineSimilarity]] treatment for
  * the bare dot.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is
  * a CodegenFallback higher-order chain: every evaluation allocates an
  * intermediate array and interprets two lambdas per element. That is
  * the per-row hot path of every projection against literal rows —
  * the OPQ rotation (64 dots/row), PQ query lookup tables, the JL
  * projection, hyperplane bucketing — measured ~1 s per 2 k-row corpus
  * pass at sf0.1 (single-partition scan) before fusion.
  *
  * Accumulation is the same strict left fold (`acc = 0.0; acc += x·y`
  * in element order) as the composable form and the DuckDB oracle's
  * `list_reduce`, so results are bitwise-identical to both — oracle
  * parity holds whether an operator uses this or the composable form
  * (pinned by DotProductSpec).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs must be array<double>; Column-API callers cast upstream
  // (the CosineSimilarity registration discipline)

  override def dataType: DataType = DoubleType

  /** Null when either input is null, the lengths mismatch, or any
    * consumed element is null — matching the composable
    * zip_with/aggregate form's null propagation. */
  override def nullable: Boolean = true

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    if (xs.numElements() != ys.numElements()) return null
    val n = xs.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      dot += xs.getDouble(i) * ys.getDouble(i)
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
