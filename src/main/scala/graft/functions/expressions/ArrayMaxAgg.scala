package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Pointwise-max aggregate over fixed-length int arrays — the HLL
  * register merge as a map-side-combinable aggregate: each group's
  * state is ONE m-element array (m·4 bytes, constant), rows and
  * partials combine by elementwise max (commutative, associative,
  * idempotent — order-free AND redelivery-safe). This is the packed
  * register layout HyperBall needs: the row-form (g, b, max(r))
  * aggregate ships one ROW per non-empty bucket per group per round,
  * which on a per-NODE sketch frame multiplies every edge join by the
  * register count; the packed form keeps one array per node so graph
  * propagation joins stay |E|-row-shaped. NULL rows are skipped;
  * input arrays must all have length m (enforced — a silent length
  * mismatch would drop registers). */
case class ArrayMaxAgg(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  require(m > 0, s"array_max_agg needs m > 0, got $m")

  override def prettyName: String = "array_max_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_max_agg requires array<int>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      require(arr.numElements() == m,
        s"array_max_agg(m=$m) fed a length-${arr.numElements()} array")
      var i = 0
      while (i < m) {
        val v = arr.getInt(i)
        if (v > buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * m)
    var i = 0
    while (i < m) { bb.putInt(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Int](m)
    var i = 0
    while (i < m) { buf(i) = bb.getInt; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArrayMaxAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArrayMaxAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ArrayMaxAgg =
    copy(child = newChild)
}
