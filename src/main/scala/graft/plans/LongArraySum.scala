package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise SUM of an `array<bigint>` column — the centroid-mean
  * aggregate as ONE array-buffered aggregate instead of 64 parallel
  * `sum(element_at(qv, i))` slots.
  *
  * Why it exists (measured, see PLANS.md round-8c): the 64-slot
  * declarative form plans as a HashAggregate whose generated
  * `doAggregateWithKeysOutput` method tops Janino's 64 KB limit —
  * "Code grows beyond 64 KB" — so every wide-mean stage (s18/s19's
  * meanCents, each Lloyd round) silently drops to interpreted
  * expression evaluation; `spark.sql.codegen.methodSplitThreshold`
  * cannot help because aggregate output code is not splittable. As a
  * `TypedImperativeAggregate[Array[Long]]` the buffer is one JVM
  * long[], updates are a tight primitive loop, and Spark plans the
  * stage as an ObjectHashAggregate: hash-based and map-side
  * combinable exactly like the declarative form (partial aggregation
  * semantics are unchanged — element-wise adds commute), with the
  * 64 KB hazard gone by construction.
  *
  * Contract (same as [[LongArrayDot]]): equal-length, null-free
  * arrays — what `TextFns.quantize` produces. Rows with a NULL array
  * are skipped; an empty group yields NULL.
  */
case class LongArraySum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "long_array_sum"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  /** Empty array = "no rows seen yet" sentinel (embeddings are
    * never zero-length, per the quantize contract). */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    if (buffer.length == 0) {
      arr.toLongArray()
    } else {
      val n = math.min(buffer.length, arr.numElements())
      var i = 0
      while (i < n) {
        buffer(i) += arr.getLong(i)
        i += 1
      }
      buffer
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b1.length == 0) return b2
    if (b2.length == 0) return b1
    val n = math.min(b1.length, b2.length)
    var i = 0
    while (i < n) {
      b1(i) += b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongArraySum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongArraySum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): LongArraySum =
    copy(child = newChild)
}

object LongArraySum {
  def apply(c: Column): Column =
    Bridge.column(LongArraySum(Bridge.expression(c)).toAggregateExpression())
}
