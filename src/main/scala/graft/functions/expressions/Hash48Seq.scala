package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native B-member hash48 family evaluation: element b (0-based) is
  * value-identical to `hash48("<seed>:<b>:<key>")` — i.e. the
  * [[Hash48]] of the seeded concat the resampling operators build per
  * (row, replicate) pair. One call per ROW computes the whole family
  * with ONE reused thread-local MessageDigest, the key encoded once,
  * and statically cached replicate-digit byte tables — replacing B
  * Catalyst `concat` allocations + B fresh UTF8String encodes per row
  * (the q150 ×B hot spot; the same one-digest-per-row move the 18s
  * streaming twin's `Bootstrap.weightsOf` made on the JVM side).
  *
  * Pair with `posexplode`: pos is the replicate index b, col the hash.
  * The DuckDB oracles are untouched — they keep the portable per-pair
  * `hash48Sql` recipe and hash-match bitwise.
  */
case class Hash48Seq(child: Expression, seed: Int, count: Int)
    extends UnaryExpression {

  require(count > 0, s"hash48_seq needs count > 0, got $count")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hash48_seq"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash48_seq requires a STRING argument, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    Hash48Seq.compute(input.asInstanceOf[UTF8String], seed, count)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.Hash48Seq.compute($c, $seed, $count)")

  override protected def withNewChildInternal(newChild: Expression): Hash48Seq =
    copy(child = newChild)
}

object Hash48Seq {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val Colon = Array[Byte](':'.toByte)

  // replicate-index digit bytes, grown monotonically and published via
  // volatile — worst case a race recomputes the same immutable table
  @volatile private var bTable: Array[Array[Byte]] = Array.empty
  private def digitsUpTo(count: Int): Array[Array[Byte]] = {
    var t = bTable
    if (t.length < count) {
      t = Array.tabulate(count)(i =>
        String.valueOf(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      bTable = t
    }
    t
  }

  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]()
  private def seedPrefix(seed: Int): Array[Byte] =
    seedCache.computeIfAbsent(seed,
      s => s"$s:".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** All `count` family members for one key:
    * out(b) = first 6 md5 bytes of "seed:b:key" as unsigned 48-bit. */
  def compute(key: UTF8String, seed: Int, count: Int): ArrayData = {
    val md = digests.get()
    val keyBytes = key.getBytes
    val seedB = seedPrefix(seed)
    val bt = digitsUpTo(count)
    val out = new Array[Long](count)
    var b = 0
    while (b < count) {
      md.reset()
      md.update(seedB)
      md.update(bt(b))
      md.update(Colon)
      md.update(keyBytes)
      val d = md.digest()
      out(b) = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
