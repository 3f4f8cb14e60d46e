package graft.functions.expressions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, BitwiseAnd, BitwiseNot, BitwiseOr, EqualTo, EvalMode, Expression, If, IsNull, Literal, ShiftRight, ShiftRightUnsigned}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, LongType}

/** Reassembly helper for [[SumInt128]]: one call per GROUP at
  * evaluate time (never per row), so BigInteger cost is group-grade. */
object SumInt128Funcs {
  /** (hi, lo) two's-complement 128-bit limbs → exact DECIMAL(38,0). */
  def toDecimal(hi: Long, lo: Long): Decimal = {
    val bi = BigInteger.valueOf(hi).shiftLeft(64)
      .add(new BigInteger(java.lang.Long.toUnsignedString(lo)))
    Decimal(BigDecimal(bi), 38, 0)
  }
}

/** Exact 128-bit integer SUM over a BIGINT column — the engine's
  * fixed-point sufficient-statistic sums at LONG-sum speed.
  *
  * Why it exists: the oracle-parity idiom sums per-row fixed-point
  * integers `floor(term * 10^6)` exactly (order-free), which a plain
  * BIGINT sum cannot guarantee (a 10^11-row group of 10^15-grade terms
  * overflows 2^63) and `sum(DECIMAL(38,0))` guarantees at ~5× the
  * per-row cost: with GROUPING keys, HashAggregate's high-precision
  * decimal buffer update allocates and copies a 16-byte Decimal per
  * row per column (measured 1.23s vs 0.43s for 10 grouped sums over
  * 600k rows at sf0.1 — the whole cost of the q166 IRLS passes).
  *
  * This aggregate keeps the running sum as a two's-complement 128-bit
  * value in TWO primitive LONG buffer slots (plus a non-null count for
  * SQL NULL semantics), so the update path is pure codegen'd long
  * arithmetic — add with explicit carry-out `((a&b)|((a|b)&~s))>>>63`
  * (Hacker's Delight 2-13) and arithmetic-shift sign extension —
  * eligible for HashAggregate's fast row-based hash map. Capacity
  * 2^127 ≈ 1.7e38 matches DECIMAL(38,0)'s range; reassembly to decimal
  * happens once per group via [[SumInt128Funcs.toDecimal]].
  *
  * Exactness: for any multiset of longs the result equals
  * `sum(CAST(v AS DECIMAL(38,0)))` bit-for-bit (same integer, same
  * decimal type), and empty/all-NULL groups return NULL — so it is a
  * drop-in for the oracle twins' decimal-sum text; parity is on
  * values, not plans. Wrapping long adds are built with
  * EvalMode.LEGACY explicitly so ANSI mode cannot turn an intentional
  * limb wrap into an error. */
case class SumInt128(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def prettyName: String = "sum128"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sum128 requires BIGINT input, got ${child.dataType.sql}")

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, cnt)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

  /** Wrapping long add — limb arithmetic must wrap even under ANSI. */
  private def wadd(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)
  /** Carry-out of unsigned a + b where s = a + b (wrapped). */
  private def carry(a: Expression, b: Expression, s: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(s))),
      Literal(63))

  override lazy val updateExpressions: Seq[Expression] = {
    val v = child
    val s = wadd(lo, v)
    // sign-extend v to 128 bits: high limb = v >> 63 (arithmetic)
    Seq(
      If(IsNull(v), hi,
        wadd(wadd(hi, ShiftRight(v, Literal(63))), carry(lo, v, s))),
      If(IsNull(v), lo, s),
      If(IsNull(v), cnt, wadd(cnt, Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val s = wadd(lo.left, lo.right)
    Seq(
      wadd(wadd(hi.left, hi.right), carry(lo.left, lo.right, s)),
      s,
      wadd(cnt.left, cnt.right))
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(cnt, Literal(0L)),
      Literal(null, DecimalType(38, 0)),
      StaticInvoke(SumInt128Funcs.getClass, DecimalType(38, 0), "toDecimal",
        Seq(hi, lo), Seq(LongType, LongType), returnNullable = false))

  override protected def withNewChildInternal(newChild: Expression): SumInt128 =
    copy(child = newChild)
}
