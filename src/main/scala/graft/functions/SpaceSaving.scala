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

/** Mergeable Space-Saving frequent-items summary (Metwally, Agrawal,
  * El Abbadi 2005) — the OVER-estimating dual of [[MGSummary]]: where
  * Misra-Gries amortizes eviction as a decrement-all spike across all k
  * counters, Space-Saving touches exactly ONE counter per arrival (the
  * min gets replaced and the newcomer inherits its count). That makes it
  * the latency-bound-stream variant: per-event cost is O(1) map ops +
  * an O(k) min scan only on eviction (a heap makes that O(log k); at
  * sketch-sized k the scan is faster in practice — no heap rebalancing
  * on the hot present-item ++ path, which dominates real streams).
  *
  * Sequentially this IS classic Space-Saving: `est(x) − true(x) ∈ [0,
  * min]` with `Σ counts = n`, so the error is ≤ n/k. Sequential SS_k is
  * isomorphic to MG_{k−1} (Agarwal et al., "Mergeable Summaries",
  * PODS'12): est_SS(x) = est_MG(x) + (n − Σ_MG)/k for every x strictly
  * above the SS min — SpaceSavingSpec replays that equality on random
  * streams. Distributed merges keep the summary honest by carrying an
  * explicit certified error `eps` instead of claiming the sequential
  * n/k bound (merge order across partitions is nondeterministic):
  *
  *   (E1) present x:  true(x) ≤ est(x)              [overestimate]
  *   (E2) present x:  est(x) − true(x) ≤ eps
  *   (E3) absent  x:  true(x) ≤ eps
  *
  * All three hold under ANY update/merge order (induction: a merge sums
  * est-or-eps per side, prunes to the k largest, and sets eps' =
  * max(eps₁+eps₂, largest pruned estimate)), so the q95 oracle pins
  * `coalesce(est, eps) ≥ exact` and `coalesce(est, eps) − eps ≤ exact`
  * as constant-true booleans — the same sketch-contract shape as q91.
  * eps itself is merge-order-specific and never crosses the oracle;
  * the spec checks it stays ≤ n/k sequentially and small under merges.
  */
final class SSSummary(val k: Int) extends Serializable {
  private[functions] val counts = scala.collection.mutable.HashMap.empty[String, Long]
  private[functions] var n = 0L   // total items observed (exact)
  private[functions] var eps = 0L // certified max over-estimate / absent mass

  /** Immutable view of the counters (over-estimates). */
  def estimates: Map[String, Long] = counts.toMap
  /** Certified error: est − true ≤ errorBound; absent true ≤ errorBound. */
  def errorBound: Long = eps
  /** Exact number of items observed (updates + merges). */
  def total: Long = n

  def add(item: String): Unit = {
    n += 1
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < k =>
        // a never-tracked item may have occurred up to eps times before
        // (eps = 0 on a fresh summary → classic insert-at-1)
        counts.update(item, eps + 1)
      case None =>
        // min-replace: newcomer inherits the evicted min's count (+1);
        // the evicted item's true count is ≤ minC, so eps covers it.
        // Post-merge the min can sit BELOW eps — the newcomer may have
        // occurred up to eps times while untracked, so it inherits
        // max(minC, eps) to keep the overestimate (sequentially
        // minC ≥ eps always, so this is classic SS there).
        var minItem: String = null
        var minC = Long.MaxValue
        counts.foreach { case (it, c) => if (c < minC || (c == minC && (minItem == null || it < minItem))) { minItem = it; minC = c } }
        counts.remove(minItem)
        counts.update(item, math.max(minC, eps) + 1)
        if (minC > eps) eps = minC
    }
  }

  def mergeWith(o: SSSummary): Unit = {
    val epsSelf = eps
    val epsOther = o.eps
    // est-or-eps per side: an item absent from a side occurred at most
    // that side's eps times there, so adding eps keeps the overestimate
    val union = scala.collection.mutable.HashMap.empty[String, Long]
    (counts.keySet ++ o.counts.keySet).foreach { it =>
      val est = (counts.get(it), o.counts.get(it)) match {
        case (Some(a), Some(b)) => a + b
        case (Some(a), None)    => a + epsOther
        case (None, Some(b))    => epsSelf + b
        case (None, None)       => 0L // unreachable
      }
      union.update(it, est)
    }
    n += o.n
    eps = epsSelf + epsOther
    counts.clear()
    if (union.size <= k) {
      union.foreach { case (it, c) => counts.update(it, c) }
    } else {
      // keep the k largest (ties by item for determinism); every pruned
      // estimate is an upper bound on its item's true count → eps covers
      val sorted = union.toArray.sortBy { case (it, c) => (-c, it) }
      sorted.take(k).foreach { case (it, c) => counts.update(it, c) }
      val maxPruned = sorted(k)._2
      if (maxPruned > eps) eps = maxPruned
    }
  }

  def toBytes: Array[Byte] = {
    val items = counts.toArray
    val itemBytes = items.map { case (s, _) => s.getBytes("UTF-8") }
    val size = 4 + 8 + 8 + 4 + items.indices.map(i => 4 + itemBytes(i).length + 8).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(k).putLong(n).putLong(eps).putInt(items.length)
    items.indices.foreach { i =>
      bb.putInt(itemBytes(i).length).put(itemBytes(i)).putLong(items(i)._2)
    }
    bb.array()
  }
}

object SSSummary {
  def fromBytes(bytes: Array[Byte]): SSSummary = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new SSSummary(bb.getInt)
    s.n = bb.getLong
    s.eps = bb.getLong
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

/** `space_saving(item, k)` → STRUCT<counters MAP<STRING,BIGINT>,
  * eps BIGINT> — over-estimating counters plus the certified error.
  * Query est(x) as `coalesce(element_at(counters, x), eps)`; then
  * `est ≥ true` and `est − eps ≤ true` hold for EVERY x.
  */
case class SpaceSaving(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SSSummary] with UnaryLike[Expression] {

  require(k >= 1, "space_saving: k must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("counters", MapType(StringType, LongType, valueContainsNull = false), nullable = false),
    StructField("eps", LongType, nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): SSSummary = new SSSummary(k)

  override def update(buffer: SSSummary, input: InternalRow): SSSummary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.toString)
    buffer
  }

  override def merge(buffer: SSSummary, other: SSSummary): SSSummary = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: SSSummary): Any = {
    val items = buffer.counts.toArray.sortBy(_._1)
    val map = new ArrayBasedMapData(
      new GenericArrayData(items.map(i => UTF8String.fromString(i._1)): Array[Any]),
      new GenericArrayData(items.map(_._2): Array[Any]))
    InternalRow(map, buffer.eps)
  }

  override def serialize(buffer: SSSummary): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): SSSummary = SSSummary.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSaving =
    copy(child = newChild)
  override def prettyName: String = "space_saving"
}

object SpaceSaving {
  /** Column wrapper: item column → struct(counters map, certified eps). */
  def space_saving(item: Column, k: Int): Column =
    GraftShim.column(
      SpaceSaving(GraftShim.expression(item), k).toAggregateExpression())
}
