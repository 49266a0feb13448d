package graft.functions

import java.nio.ByteBuffer
import java.util.{Comparator, PriorityQueue}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** k-th smallest long — the KMV sketch's order statistic — as a bounded
  * TypedImperativeAggregate: the buffer is a max-heap of at most k
  * values, so aggregation state is k longs per group no matter how many
  * rows flow through (vs. a window sort over ALL values). Partial
  * aggregation and merges work like any Spark aggregate: map-side
  * combine keeps ≤k values per partition, merges union two heaps and
  * re-truncate. NULL until k distinct values have been seen.
  *
  * Input is expected pre-deduplicated (KMV is defined over the distinct
  * hash set); duplicates would bias the estimate low on both engines.
  */
case class KthMin(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PriorityQueue[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1, "k must be >= 1")

  override def prettyName: String = "kth_min"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kth_min requires a BIGINT column, got ${child.dataType.simpleString}")
    }

  override def createAggregationBuffer(): PriorityQueue[java.lang.Long] =
    new PriorityQueue[java.lang.Long](k, Comparator.reverseOrder[java.lang.Long]())

  private def insert(heap: PriorityQueue[java.lang.Long], v: Long): Unit = {
    if (heap.size() < k) heap.add(v)
    else if (v < heap.peek()) { heap.poll(); heap.add(v) }
  }

  override def update(heap: PriorityQueue[java.lang.Long], input: InternalRow): PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(heap, v.asInstanceOf[Long])
    heap
  }

  override def merge(a: PriorityQueue[java.lang.Long], b: PriorityQueue[java.lang.Long]): PriorityQueue[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(heap: PriorityQueue[java.lang.Long]): Any =
    if (heap.size() < k) null else heap.peek()

  override def serialize(heap: PriorityQueue[java.lang.Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * heap.size())
    buf.putInt(heap.size())
    val it = heap.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[java.lang.Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val heap = createAggregationBuffer()
    (0 until n).foreach(_ => heap.add(buf.getLong))
    heap
  }

  override def withNewMutableAggBufferOffset(offset: Int): KthMin =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KthMin =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): KthMin = copy(child = c)
}
