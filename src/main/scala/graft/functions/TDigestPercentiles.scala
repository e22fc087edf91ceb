package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable t-digest percentile state (Dunning & Ertl's merging digest,
  * k1 = (δ/2π)·asin(2q−1) scale) — the sketch whose per-group state is
  * O(compression) CENTROIDS regardless of group size, against exact
  * `percentile`'s buffer-every-value (the unbounded-agg-state class that
  * kills at 100 TB, see SCALE.md "Percentiles"). Beside Spark's built-in
  * Greenwald-Khanna `approx_percentile` (q39) this demonstrates the
  * remaining native-aggregate extension point: a Catalyst
  * [[TypedImperativeAggregate]] with an arbitrary Java object as
  * aggregation buffer, serialized to bytes only at shuffle boundaries —
  * the same machinery Spark's own Percentile/HLL++ aggregates use.
  *
  * The asin scale keeps tail bins small (bin q-width ≤ π/δ, shrinking
  * toward q→0/1), which is why t-digest quotes relative-to-tail accuracy
  * where GK quotes uniform rank error. Estimates interpolate between
  * centroid means (exact min/max tracked for the tails).
  *
  * Determinism note: centroid means are weighted double averages, so the
  * ESTIMATES vary in the last ulps with partition order — like every
  * sketch, only the verified error CONTRACT crosses the oracle boundary
  * (rank interval within target ± n·errorBound, q69), never the values.
  */
final class TDigest(val compression: Double) extends Serializable {
  import scala.collection.mutable.ArrayBuffer

  private[functions] val means   = ArrayBuffer.empty[Double] // merged centroids, sorted
  private[functions] val weights = ArrayBuffer.empty[Double]
  private val buf = ArrayBuffer.empty[Double]                // unmerged raw points
  private val bufCap = math.max(64, 4 * compression.toInt)
  private[functions] var total = 0.0
  private[functions] var lo = Double.PositiveInfinity
  private[functions] var hi = Double.NegativeInfinity

  def isEmpty: Boolean = total == 0.0
  def totalWeight: Double = total

  def add(x: Double): Unit = if (!x.isNaN) {
    buf += x
    total += 1.0
    if (x < lo) lo = x
    if (x > hi) hi = x
    if (buf.length >= bufCap) compress()
  }

  def mergeWith(o: TDigest): Unit = if (!o.isEmpty) {
    o.compress()
    // other's centroids enter as weighted points; compress() re-sorts and
    // re-clusters everything under the k1 limit
    means ++= o.means
    weights ++= o.weights
    total += o.total
    if (o.lo < lo) lo = o.lo
    if (o.hi > hi) hi = o.hi
    compress()
  }

  private def kFn(q: Double): Double =
    compression / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)
  private def kInv(k: Double): Double = {
    val kc = math.min(compression / 4, math.max(-compression / 4, k))
    (math.sin(2 * math.Pi * kc / compression) + 1) / 2
  }

  /** Re-cluster centroids + buffered points under the k1 scale: one sorted
    * pass, greedy absorption while the centroid's q-span stays within one
    * k unit. O(m log m) in the current point count, bounded by bufCap + δ.
    */
  private[functions] def compress(): Unit = {
    if (buf.isEmpty && isSorted) return
    val m = means.length + buf.length
    if (m == 0) return
    val pm = new Array[Double](m)
    val pw = new Array[Double](m)
    var i = 0
    while (i < means.length) { pm(i) = means(i); pw(i) = weights(i); i += 1 }
    var j = 0
    while (j < buf.length) { pm(i) = buf(j); pw(i) = 1.0; i += 1; j += 1 }
    val order = (0 until m).sortBy(i => pm(i))
    means.clear(); weights.clear(); buf.clear()

    var wSoFar = 0.0
    var qLimit = total * kInv(kFn(0.0) + 1)
    var cm = pm(order(0))
    var cw = pw(order(0))
    var p = 1
    while (p < m) {
      val x = pm(order(p)); val w = pw(order(p))
      if (wSoFar + cw + w <= qLimit) {
        // weighted mean; cw+w bounded by qLimit so no overflow concerns
        cm += (x - cm) * w / (cw + w)
        cw += w
      } else {
        means += cm; weights += cw
        wSoFar += cw
        qLimit = total * kInv(kFn(wSoFar / total) + 1)
        cm = x; cw = w
      }
      p += 1
    }
    means += cm; weights += cw
  }

  private def isSorted: Boolean = {
    var i = 1
    while (i < means.length) { if (means(i - 1) > means(i)) return false; i += 1 }
    true
  }

  /** Quantile estimate: linear interpolation between centroid midpoints,
    * exact min/max at the tails.
    */
  def quantile(q: Double): Double = {
    compress()
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    val t = math.min(1.0, math.max(0.0, q)) * total
    val firstMid = weights(0) / 2
    if (t < firstMid) return lo + (t / firstMid) * (means(0) - lo)
    var cum = 0.0
    var i = 0
    while (i < n - 1) {
      val midI = cum + weights(i) / 2
      val midN = cum + weights(i) + weights(i + 1) / 2
      if (t < midN) {
        val f = if (midN == midI) 0.0 else (t - midI) / (midN - midI)
        return means(i) + f * (means(i + 1) - means(i))
      }
      cum += weights(i)
      i += 1
    }
    val lastMid = cum + weights(n - 1) / 2
    val rem = total - lastMid
    if (rem <= 0) return hi
    val f = math.min(1.0, math.max(0.0, (t - lastMid) / rem))
    means(n - 1) + f * (hi - means(n - 1))
  }

  def toBytes: Array[Byte] = {
    compress()
    val n = means.length
    val bb = java.nio.ByteBuffer.allocate(8 * 4 + 4 + 16 * n)
    bb.putDouble(compression).putDouble(total).putDouble(lo).putDouble(hi).putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(means(i)); i += 1 }
    i = 0
    while (i < n) { bb.putDouble(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigest {
  def fromBytes(bytes: Array[Byte]): TDigest = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = new TDigest(bb.getDouble)
    d.total = bb.getDouble
    d.lo = bb.getDouble
    d.hi = bb.getDouble
    val n = bb.getInt
    var i = 0
    while (i < n) { d.means += bb.getDouble; i += 1 }
    i = 0
    while (i < n) { d.weights += bb.getDouble; i += 1 }
    d
  }
}

/** `t_digest_percentiles(value, percentages, compression)` — the Catalyst
  * aggregate around [[TDigest]]. The buffer lives as the Java object
  * during partial aggregation and crosses the shuffle as the serialized
  * centroid list (16·δ bytes) — mergeable state, the property that lets
  * pre-aggregated per-partition digests combine without revisiting rows.
  */
case class TDigestPercentiles(
    child: Expression,
    percentages: Seq[Double],
    compression: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  require(compression >= 20, "t_digest_percentiles: compression must be >= 20")
  require(percentages.nonEmpty && percentages.forall(p => p >= 0 && p <= 1),
    "t_digest_percentiles: percentages must be in [0, 1]")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): TDigest = new TDigest(compression.toDouble)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Number].doubleValue())
    buffer
  }

  override def merge(buffer: TDigest, other: TDigest): TDigest = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: TDigest): Any =
    if (buffer.isEmpty) null
    else new GenericArrayData(percentages.map(buffer.quantile).toArray)

  override def serialize(buffer: TDigest): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestPercentiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestPercentiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TDigestPercentiles =
    copy(child = newChild)
  override def prettyName: String = "t_digest_percentiles"
}

object TDigestPercentiles {
  /** Column wrapper: value column → array<double> of percentile estimates. */
  def t_digest_percentiles(value: Column, percentages: Seq[Double], compression: Int): Column =
    GraftShim.column(
      TDigestPercentiles(GraftShim.expression(value), percentages, compression)
        .toAggregateExpression())
}
