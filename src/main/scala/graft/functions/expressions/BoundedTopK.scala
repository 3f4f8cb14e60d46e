package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Bounded top-k election state: ids held in (score DESC, id ASC)
  * order, capacity k — identical selection semantics to
  * `row_number() OVER (ORDER BY score DESC, id) <= k`, as a sorted
  * insert-bounded array. */
final class TopKBuffer(val k: Int) {
  var size: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  // SQL total order, NOT raw >/==: both Spark and DuckDB sort NaN as
  // the LARGEST double under ORDER BY score DESC, and raw > makes NaN
  // never-better (silently dropped when the buffer is full, appended
  // at the tail when it is not — a merge-order-dependent elected
  // set). Mirror Spark's SQLOrderingUtil.compareDoubles: ±0.0 stay
  // EQUAL (s1 == s2 first — Double.compare alone would rank 0.0 over
  // -0.0 and steal the id tie-break), everything else incl. NaN via
  // Double.compare (NaN above +Inf) — exactly the row_number window
  // order this aggregate claims parity with.
  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    // c == 0 for both ±0.0 (via ==) and NaN/NaN (via compare)
    val c = if (s1 == s2) 0 else java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  def insert(s: Double, id: Long): Unit = {
    if (size == k && !better(s, id, scores(size - 1), ids(size - 1))) return
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(s, id, scores(mid), ids(mid))) hi = mid else lo = mid + 1
    }
    val pos = lo
    var i = math.min(size, k - 1)
    while (i > pos) {
      scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1
    }
    scores(pos) = s
    ids(pos) = id
    if (size < k) size += 1
  }
}

/** Map-side-combinable bounded top-k aggregate: elects the k ids with
  * the highest (score, then smallest id) — the same deterministic set
  * a `row_number() OVER (PARTITION BY g ORDER BY score DESC, id) <= k`
  * window keeps, WITHOUT the per-group sort: partial state is a
  * k-entry array on every map task (k ≈ shortlist depth, a constant),
  * so no partition ever holds a group's full candidate set. This is
  * the scale-path shortlist election for the ANN operators (q151);
  * the DuckDB oracles keep the equivalent row_number formulation —
  * the elected SET is identical, so hashes still match.
  *
  * Returns array<bigint> of the winning ids in rank order (element i
  * = rank i+1). Null score or id rows are skipped.
  */
case class BoundedTopK(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, s"bounded_topk needs k > 0, got $k")

  override def left: Expression = scoreExpr
  override def right: Expression = idExpr

  override def prettyName: String = "bounded_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_topk requires (DOUBLE score, BIGINT id), got " +
        s"(${scoreExpr.dataType.catalogString}, ${idExpr.dataType.catalogString})")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      buf.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) {
      buf.insert(other.scores(i), other.ids(i)); i += 1
    }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    UnsafeArrayData.fromPrimitiveArray(
      java.util.Arrays.copyOfRange(buf.ids, 0, buf.size))

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    // entries arrive already in order: straight fill, no re-sorting
    while (i < n) {
      buf.scores(i) = bb.getDouble; buf.ids(i) = bb.getLong; i += 1
    }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedTopK =
    copy(scoreExpr = newLeft, idExpr = newRight)
}
