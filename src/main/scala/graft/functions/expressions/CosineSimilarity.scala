package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two array<double>
  * columns in ONE fused loop.
  *
  * The composable form (`zip_with` product + `aggregate` fold + norms)
  * is correct but materializes an intermediate array and walks the
  * vectors multiple times per pair — measurable on LSH/ANN candidate
  * scoring where millions of pairs flow through. This expression keeps
  * three scalar accumulators in registers inside whole-stage codegen:
  * no allocation, one pass.
  *
  * Accumulation is the same strict left fold per accumulator as
  * [[graft.functions.VectorMath]] / the DuckDB oracle's `list_reduce`,
  * so results stay bitwise-identical to both (oracle parity holds
  * whether an operator uses this or the composable form).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs must be array<double> — the Engine's registration wraps SQL
  // arguments in a Cast to array<double>, and Column-API callers cast
  // upstream (ExpectsInputTypes/AbstractDataType are private[sql] in
  // Spark 4, so type errors surface from that Cast instead)

  override def dataType: DataType = DoubleType

  /** Null when either input OR any consumed element is null — matching
    * the composable zip_with/aggregate form's null propagation. */
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    // length mismatch → null, matching the composable zip_with form
    // (which null-pads the short side) and the oracle's indexed reads
    if (xs.numElements() != ys.numElements()) return null
    val n = xs.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = xs.getDouble(i)
      val y = ys.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  double $na = 0.0;
         |  double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    $dot += $x * $y;
         |    $na += $x * $x;
         |    $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
