package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) sketch state: the k smallest DISTINCT hash
  * values seen, held ascending, capacity k. The dedup-on-insert is
  * what separates this from [[TopKBuffer]]: a sketch fed a MULTISET
  * (every fact row, duplicates included) must count each key once, so
  * equal values collapse instead of occupying slots. */
final class KmvBuffer(val k: Int) {
  var size: Int = 0
  val vs: Array[Long] = new Array[Long](k)

  def insert(h: Long): Unit = {
    // ascending insertion point (first index with vs(i) >= h)
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (vs(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < size && vs(lo) == h) return // already present: multiset → set
    if (lo >= k) return                  // larger than every kept value, full
    var i = math.min(size, k - 1)
    while (i > lo) { vs(i) = vs(i - 1); i -= 1 }
    vs(lo) = h
    if (size < k) size += 1
  }
}

/** Map-side-combinable KMV bottom-k-distinct aggregate: keeps the k
  * smallest DISTINCT values of a BIGINT hash column per group — the
  * classic k-minimum-values distinct sketch (Bar-Yossef et al. 2002).
  * State is a k-entry sorted array on every map task regardless of
  * row count or key cardinality; partials merge by re-insertion
  * (union of bottom-k sets → bottom-k of the union — order-free AND
  * redelivery-idempotent, the HLL register contract, because insert
  * dedups). Returns array<bigint> ascending; element k−1 (when the
  * group reached capacity) is the kth minimum the estimator divides
  * by, and the whole array is a uniform sample of the group's
  * DISTINCT key population — the capability HLL cannot offer. NULL
  * rows are skipped. The DuckDB oracles keep the equivalent
  * `row_number() OVER (ORDER BY h) <= k` formulation over the
  * deduplicated hash set — the kept SET is identical.
  */
case class KmvBottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k > 0, s"kmv_bottomk needs k > 0, got $k")

  override def prettyName: String = "kmv_bottomk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_bottomk requires a BIGINT hash, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = child.eval(input)
    if (h != null) buf.insert(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.vs(i)); i += 1 }
    buf
  }

  override def eval(buf: KmvBuffer): Any =
    UnsafeArrayData.fromPrimitiveArray(
      java.util.Arrays.copyOfRange(buf.vs, 0, buf.size))

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.vs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    // entries arrive already ascending and distinct: straight fill
    while (i < n) { buf.vs(i) = bb.getLong; i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvBottomK =
    copy(child = newChild)
}
