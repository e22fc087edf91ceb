package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable K-Minimum-Values distinct-count sketch (Bar-Yossef et al.,
  * RANDOM'02; Beyer et al., SIGMOD'07): keep the k smallest DISTINCT
  * hash values seen; with hashes uniform on [0, 1), the k-th smallest
  * kept value r_k estimates the distinct count as (k−1)/r_k (the
  * unbiased KMV estimator), with relative error ~1/√(k−2).
  *
  * The property that distinguishes KMV from HLL (q59) here: the summary
  * is a PURE FUNCTION OF THE INPUT SET — "k smallest distinct values"
  * does not depend on arrival order, partitioning, or merge shape. So
  * the ESTIMATE ITSELF crosses the engine boundary: the DuckDB oracle
  * recomputes the same k-th smallest distinct hash by sorting and gets
  * the bit-identical double, where HLL++'s estimate is engine-specific
  * and only its error CONTRACT could be checked (q59's `sketch_ok`).
  * Merge-shape invariance is asserted literally in KmvSpec (1/4/16/32
  * partitions → equal structs).
  *
  * State is O(k) longs, bounded under arbitrary merges (union, then
  * truncate back to the k smallest). Beyond counting, the same summary
  * supports set algebra exact sketches can't afford at 100 TB: union =
  * merge; Jaccard/intersection estimates from the fraction of shared
  * values among the k smallest of the union (not exposed here; q96
  * covers source overlap exactly over grams).
  *
  * Input is a pre-hashed BIGINT column in [0, 2^52) — 52 bits so the
  * double normalization r = h / 2^52 is EXACT (52-bit integers are
  * representable; division by a power of two only shifts the exponent),
  * keeping every arithmetic step deterministic across engines. Hash
  * collisions under-count like any hash-based distinct, but
  * deterministically so: both engines see the same collisions, and at
  * n ≈ 10^6 distinct, P(any collision) ≈ n²/2^53 ≈ 10^-4.
  *
  * Fewer than k distinct hashes → the sketch holds the whole distinct
  * set and reports it exactly (kth_hash = null, est = n_kept).
  */
final class KmvState(val k: Int) extends Serializable {
  // k smallest distinct hashes; TreeSet gives O(log k) insert/dedup and
  // O(1) access to the current max (the eviction candidate)
  private[functions] val mins = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit = {
    if (mins.size < k) { mins.add(h); () }
    else if (h < mins.last) {
      if (mins.add(h)) { mins.remove(mins.last); () }
    }
  }

  def mergeWith(o: KmvState): Unit = {
    val it = o.mins.iterator()
    while (it.hasNext) add(it.next())
  }

  def size: Int = mins.size
  def kthHash: Long = mins.last

  /** (k−1)/r_k when the sketch is full, else the exact kept count. */
  def estimate: Double =
    if (mins.size < k) mins.size.toDouble
    else (k - 1).toDouble / (mins.last.toDouble / KmvState.Norm)

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 8 * mins.size)
    bb.putInt(k).putInt(mins.size)
    mins.forEach(h => { bb.putLong(h); () })
    bb.array()
  }
}

object KmvState {
  /** 2^52 — hashes are 52-bit so h/2^52 is FP-exact. */
  val Norm: Double = 4503599627370496.0

  def fromBytes(bytes: Array[Byte]): KmvState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new KmvState(bb.getInt)
    val n = bb.getInt
    (0 until n).foreach(_ => s.mins.add(bb.getLong))
    s
  }
}

/** `kmv_distinct(hash52, k)` → STRUCT<n_kept INT, kth_hash BIGINT,
  * est DOUBLE>. `hash52` must be a BIGINT uniform on [0, 2^52) — e.g.
  * `CAST(conv(substring(md5(CAST(x AS STRING)), 1, 13), 16, 10) AS BIGINT)`
  * — so the oracle can replay the identical hash. kth_hash is null until
  * the sketch is full (est is then the exact kept count).
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] with UnaryLike[Expression] {

  require(k >= 2, "kmv_distinct: k must be >= 2 (estimator is (k-1)/r_k)")

  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", IntegerType, nullable = false),
    StructField("kth_hash", LongType, nullable = true),
    StructField("est", DoubleType, nullable = false)))
  override def nullable: Boolean = false

  // reject non-integral children at ANALYSIS time — without this a
  // `kmv_distinct(CAST(h AS DOUBLE), k)` SQL call would analyze fine and
  // then ClassCastException per row at execution
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_distinct requires an integral hash column, got ${dt.sql}")
    }

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buffer: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[java.lang.Number].longValue)
    buffer
  }

  override def merge(buffer: KmvState, other: KmvState): KmvState = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: KmvState): Any =
    InternalRow(
      buffer.size,
      if (buffer.size < k) null else buffer.kthHash,
      buffer.estimate)

  override def serialize(buffer: KmvState): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): KmvState = KmvState.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
  override def prettyName: String = "kmv_distinct"
}

object KmvDistinct {
  /** Column wrapper: 52-bit hash column → struct(n_kept, kth_hash, est). */
  def kmv_distinct(hash52: Column, k: Int): Column =
    GraftShim.column(
      KmvDistinct(GraftShim.expression(hash52), k).toAggregateExpression())
}
