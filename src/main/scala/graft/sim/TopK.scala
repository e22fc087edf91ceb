package graft.sim

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap top-k as a typed Aggregator — the scale path for per-group
  * top-k when groups are numerous or large. The window form
  * (`row_number over (partition by g order by ...) <= k`) buffers and sorts
  * every row of every group; this Aggregator's state is AT MOST k entries
  * per group at every point of the partial/merge tree, so memory is
  * O(groups × k) regardless of group size and the shuffle carries reduced
  * k-entry buffers, not raw rows (map-side partial top-k for free).
  *
  * Ordering: score DESC, then id ASC — the same deterministic tie-break
  * every ranked query in the catalog uses.
  */
object TopK {

  /** One scored candidate. */
  final case class Scored(id: Long, score: Double)

  /** Buffer/output carrier: up-to-k best entries, rank-ordered. */
  final case class TopKBuf(entries: Seq[Scored])

  private def lt(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** The buffer is kept SORTED — k is small, insertion into a k-vector
    * beats heap constant-factors and keeps merge trivial. */
  final case class TopKAgg(k: Int) extends Aggregator[Scored, TopKBuf, TopKBuf] {
    override def zero: TopKBuf = TopKBuf(Vector.empty)

    private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] =
      if (buf.size >= k && lt(buf.last, x)) buf
      else {
        val i = buf.indexWhere(b => lt(x, b)) match { case -1 => buf.size; case j => j }
        (buf.take(i) :+ x) ++ buf.drop(i).take(k - i - 1)
      }

    override def reduce(buf: TopKBuf, x: Scored): TopKBuf = TopKBuf(insert(buf.entries, x))
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf(b.entries.foldLeft(a.entries)(insert))
    override def finish(buf: TopKBuf): TopKBuf = buf
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }
}
