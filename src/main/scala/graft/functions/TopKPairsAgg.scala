package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score, id) pairs, where better
  * means higher score, ties broken by lower id (deterministic output).
  * Backed by a worst-first binary heap so insert is O(log k) and memory is
  * O(k) regardless of how many rows stream through. */
final class TopKPairsBuffer(val k: Int) {
  // worst-first ordering: the queue's head is the CURRENT WORST pair, so
  // a full buffer evicts in O(log k) only when the candidate beats it
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }
  private val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  def insert(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else {
      val (ws, wid) = heap.head
      // better than the worst: higher score, or same score and lower id
      if (score > ws || (score == ws && id < wid)) {
        heap.dequeue()
        heap.enqueue((score, id))
      }
    }
  }

  def mergeFrom(other: TopKPairsBuffer): Unit =
    other.heap.foreach { case (s, id) => insert(s, id) }

  /** Best-first: score descending, id ascending. */
  def sorted: Array[(Double, Long)] =
    heap.toArray.sortBy { case (s, id) => (-s, id) }
}

/** `topk_pairs(score, id, k)` — native bounded top-k aggregation.
  *
  * The scale-safe replacement for `row_number() OVER (PARTITION BY ...)`
  * top-k: as a [[TypedImperativeAggregate]] it runs inside
  * ObjectHashAggregate with PARTIAL aggregation, so each task keeps an
  * O(k) heap and only k rows per group per partition ever reach the
  * shuffle — the full scored corpus is never sorted or exchanged
  * (reference design cue: its block-granular jobs never sort globally,
  * reference: src/mini_spark/plan.py:90-93).
  *
  * Returns `array<struct<score:double,id:bigint>>` sorted best-first
  * (score desc, id asc).
  */
case class TopKPairsAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPairsBuffer] {

  require(k > 0, s"topk_pairs requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): TopKPairsBuffer = new TopKPairsBuffer(k)

  override def update(buffer: TopKPairsBuffer, input: InternalRow): TopKPairsBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKPairsBuffer, other: TopKPairsBuffer): TopKPairsBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKPairsBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKPairsBuffer): Array[Byte] = {
    val pairs = buffer.sorted
    val bb = ByteBuffer.allocate(4 + pairs.length * 16)
    bb.putInt(pairs.length)
    pairs.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): TopKPairsBuffer = {
    val bb = ByteBuffer.wrap(storageFormat)
    val n = bb.getInt
    val buf = new TopKPairsBuffer(k)
    var i = 0
    while (i < n) {
      buf.insert(bb.getDouble, bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}
