package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries heavy-hitters summary — the frequent-items
  * sketch: at most `k` counters regardless of stream length or domain
  * size, against exact top-k's full-domain hash table (another
  * unbounded-agg-state class at 100 TB: a token/URL/entity frequency
  * table over a web corpus IS the domain). Completes graft's sketch
  * family: HLL++ (q59), GK (q39), t-digest (q69), bloom (q80), MinHash
  * (q18), SimHash (q24), and now frequent items.
  *
  * Theory (Misra-Gries 1982; merge per Agarwal et al., "Mergeable
  * Summaries", PODS'12): after any sequence of updates and merges over a
  * stream of n items, every estimate satisfies
  * `true − n/(k+1) ≤ est ≤ true` (est = 0 for absent items), so any item
  * with true count > n/(k+1) is guaranteed present. Both bounds hold
  * under ANY merge order — exactly what the q91 oracle pins, since the
  * surviving counter SET (like every sketch's internals) is
  * partition-order-specific.
  *
  * Eviction is the classic decrement-all: when a new item arrives at
  * capacity, every counter drops by 1 (amortized O(1) decrements per
  * update across the stream); merge adds counters pointwise, then
  * subtracts the (k+1)-th largest value from all and keeps positives.
  */
final class MGSummary(val k: Int) extends Serializable {
  private[functions] val counts = scala.collection.mutable.HashMap.empty[String, Long]
  private[functions] var n = 0L // total items observed (exact)

  /** Immutable view of the counters (under-estimates). */
  def estimates: Map[String, Long] = counts.toMap
  /** Exact number of items observed (updates + merges). */
  def total: Long = n

  def add(item: String): Unit = {
    n += 1
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < k => counts.update(item, 1L)
      case None =>
        // decrement-all; drop zeros
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace((_, c) => c - 1)
        counts.foreach { case (it, c) => if (c <= 0) dead += it }
        dead.foreach(counts.remove)
    }
  }

  def mergeWith(o: MGSummary): Unit = {
    n += o.n
    o.counts.foreach { case (it, c) =>
      counts.update(it, counts.getOrElse(it, 0L) + c)
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest count from all, keep positives
      val cut = counts.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - cut)
      counts.foreach { case (it, c) => if (c <= 0) dead += it }
      dead.foreach(counts.remove)
    }
  }

  def toBytes: Array[Byte] = {
    val items = counts.toArray
    val itemBytes = items.map { case (s, _) => s.getBytes("UTF-8") }
    val size = 4 + 8 + 4 + items.indices.map(i => 4 + itemBytes(i).length + 8).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(k).putLong(n).putInt(items.length)
    items.indices.foreach { i =>
      bb.putInt(itemBytes(i).length).put(itemBytes(i)).putLong(items(i)._2)
    }
    bb.array()
  }
}

object MGSummary {
  def fromBytes(bytes: Array[Byte]): MGSummary = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new MGSummary(bb.getInt)
    s.n = bb.getLong
    val m = bb.getInt
    (0 until m).foreach { _ =>
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      s.counts.update(new String(arr, "UTF-8"), bb.getLong)
    }
    s
  }
}

/** `heavy_hitters(item, k)` → MAP<STRING, BIGINT> of surviving counters
  * (lower-bound estimates). State crosses the shuffle as ≤ k (item,
  * count) pairs — mergeable, bounded, domain-independent.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] with UnaryLike[Expression] {

  require(k >= 1, "heavy_hitters: k must be >= 1")

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buffer: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.toString)
    buffer
  }

  override def merge(buffer: MGSummary, other: MGSummary): MGSummary = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: MGSummary): Any = {
    // deterministic map encoding order (by item) — map equality is
    // order-insensitive, but a stable order keeps plans reproducible
    val items = buffer.counts.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(items.map(i => UTF8String.fromString(i._1)): Array[Any]),
      new GenericArrayData(items.map(_._2): Array[Any]))
  }

  override def serialize(buffer: MGSummary): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): MGSummary = MGSummary.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
  override def prettyName: String = "heavy_hitters"
}

object HeavyHitters {
  /** Column wrapper: item column → map<string, bigint> of MG counters. */
  def heavy_hitters(item: Column, k: Int): Column =
    GraftShim.column(
      HeavyHitters(GraftShim.expression(item), k).toAggregateExpression())
}
