package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries summary over a stream of items: at most `k` counters,
  * with the classic guarantees
  *   - any item whose true frequency exceeds n/(k+1) IS among the
  *     counters (no false negatives above the threshold);
  *   - each reported count understates the true count by at most
  *     n/(k+1).
  * Counters MERGE (sum same-key counts, then rescale by the (k+1)-th
  * largest and drop non-positives — Agarwal et al.'s mergeable-summaries
  * construction, which preserves the error bound additively), so the
  * sketch runs as a partial aggregate: every task keeps O(k) state and
  * ships k (item, count) pairs to one reducer — the heavy-hitters
  * analog of the HLL distinct and histogram quantile sketches. */
final class HeavyHittersBuffer(val k: Int) {
  private[functions] val counters =
    scala.collection.mutable.HashMap.empty[String, Long]

  def insert(item: String): Unit = {
    counters.get(item) match {
      case Some(c) => counters.update(item, c + 1)
      case None if counters.size < k => counters.update(item, 1L)
      case None =>
        // decrement-all: each stored count funds one decrement, so the
        // amortized cost per insert is O(1)
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        counters.foreach { case (key, c) =>
          if (c == 1L) dead += key else counters.update(key, c - 1)
        }
        dead.foreach(counters.remove)
    }
  }

  def mergeFrom(other: HeavyHittersBuffer): Unit = {
    other.counters.foreach { case (key, c) =>
      counters.update(key, counters.getOrElse(key, 0L) + c)
    }
    if (counters.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0
      val cut = counters.values.toArray.sorted(Ordering[Long].reverse)(k)
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      counters.foreach { case (key, c) =>
        if (c - cut <= 0) dead += key else counters.update(key, c - cut)
      }
      dead.foreach(counters.remove)
    }
  }

  /** Count descending, item ascending — deterministic output. */
  def sorted: Array[(String, Long)] =
    counters.toArray.sortBy { case (item, c) => (-c, item) }
}

/** `heavy_hitters(item, k)` — the mergeable Misra–Gries aggregate.
  * Returns `array<struct<item:string,count:bigint>>` (count desc, item
  * asc). Counts are LOWER BOUNDS with error ≤ n/(k+1); the superset
  * guarantee is what consumers rely on — confirm candidates with an
  * exact count over the (≤ k, broadcastable) candidate set to get the
  * exact heavy-hitter set without ever aggregating the full domain. */
case class HeavyHittersAgg(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HeavyHittersBuffer] {

  require(k > 0, s"heavy_hitters requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): HeavyHittersBuffer =
    new HeavyHittersBuffer(k)

  override def update(buffer: HeavyHittersBuffer,
                      input: InternalRow): HeavyHittersBuffer = {
    val v = item.eval(input)
    // .toString copies out of the (reused) UTF8String backing buffer
    if (v != null) buffer.insert(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: HeavyHittersBuffer,
                     other: HeavyHittersBuffer): HeavyHittersBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: HeavyHittersBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: HeavyHittersBuffer): Array[Byte] = {
    val entries = buffer.sorted.map { case (s, c) =>
      (s.getBytes("UTF-8"), c)
    }
    val bb = ByteBuffer.allocate(
      4 + entries.map { case (b, _) => 4 + b.length + 8 }.sum)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): HeavyHittersBuffer = {
    val bb = ByteBuffer.wrap(storageFormat)
    val n = bb.getInt
    val buf = new HeavyHittersBuffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      buf.counters.update(new String(b, "UTF-8"), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
}
