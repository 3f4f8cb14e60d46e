package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused 48-bit md5-prefix hash: the same value as
  * `conv(substring(md5(s), 1, 12), 16, 10)` (graft.functions.Hashing's
  * portable recipe — first 12 hex chars = first 6 digest bytes,
  * big-endian unsigned) without materializing the 32-char hex string,
  * substringing it, and re-parsing it base-16 per call. This chain is
  * the per-TOKEN hot loop of every dedup/text operator (shingle keys,
  * simhash votes, fingerprints), so the three dead string allocations
  * per token are worth a dedicated expression.
  *
  * Value-identical to the composable form — the DuckDB oracles
  * (`Hashing.hash48Sql`) stay untouched and still hash-match.
  */
case class Hash48(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "hash48"

  /** Strings only — matching the composable md5 chain's strictness. A
    * blanket cast-to-string would silently hash the string RENDERING of
    * arrays/structs/doubles, which the portable SQL recipe cannot
    * reproduce; better to fail analysis. */
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash48 requires a STRING argument, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    Hash48.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.Hash48.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash48 =
    copy(child = newChild)
}

object Hash48 {
  // MessageDigest is stateful and not thread-safe; one per task thread
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 6 md5 digest bytes as an unsigned big-endian 48-bit long —
    * exactly `('0x' || substr(md5(s), 1, 12))::BIGINT`. */
  def compute(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }
}
