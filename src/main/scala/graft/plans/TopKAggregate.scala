package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact top-k of a BIGINT column as a true AGGREGATE (not a window):
  * `TypedImperativeAggregate` with a bounded mutable buffer — the (b+)
  * extension tier for aggregations whose state is not expressible as
  * fixed columns (sketches, heaps, reservoirs).
  *
  * Result is the k largest values, descending, comma-joined (a string so
  * the driver's parquet/pandas compare handles it; array-valued result
  * columns do not survive that compare).
  *
  * Scale notes: the buffer is O(k) regardless of group size, partial
  * buffers merge associatively, and serialization is k longs — this is
  * the same state-shape contract HLL/quantile sketches use, so at
  * 100 TB the aggregate distributes exactly like approx_count_distinct:
  * map-side partials, one shuffle of k-long buffers per group.
  */
case class TopKLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]] {

  type Buf = scala.collection.mutable.ArrayBuffer[Long]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): Buf =
    new scala.collection.mutable.ArrayBuffer[Long](k + 1)

  private def insert(buf: Buf, v: Long): Buf = {
    // keep buf sorted descending, capped at k (k is small: insertion)
    var pos = buf.length
    while (pos > 0 && buf(pos - 1) < v) pos -= 1
    if (pos < k) {
      buf.insert(pos, v)
      if (buf.length > k) buf.remove(k)
    }
    buf
  }

  override def update(buf: Buf, input: org.apache.spark.sql.catalyst.InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long]) else buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: Buf): Any =
    UTF8String.fromString(buf.mkString(","))

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKLongs =
    copy(child = newChildren.head)
}

object TopKLongs {
  import org.apache.spark.sql.Column
  def topk(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      TopKLongs(org.apache.spark.sql.graft.Bridge.expression(c), k)
        .toAggregateExpression())
}
