package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf

import scala.collection.mutable

/** Opt-in planner strategy: plans the window-top-k logical shape
  *
  * {{{ Filter(rank <= k, Window(row_number() over (partition by g order by o))) }}}
  *
  * as [[TopKPerGroupExec]] — a bounded-heap physical operator with ≤k
  * rows of state per group, instead of WindowExec's buffer-and-sort of
  * every group (the single most common scale flaw in analytic plans:
  * fine at 10k rows per group, fatal at 10B). The rewrite preserves
  * row_number semantics exactly when the ordering is TOTAL (with ties,
  * row_number itself is nondeterministic, and so is this operator —
  * the same contract, stated rather than hidden).
  *
  * OFF by default, like [[SketchDistinct]]: oracle-checked queries keep
  * their explicitly-written plans. Opt in per session:
  * {{{
  *   TopKRewrite.install(spark)
  *   spark.conf.set(TopKRewrite.FlagKey, "true")
  * }}}
  *
  * This completes the extension-point matrix: scalar `Expression`s,
  * `TypedImperativeAggregate`s, a typed `Aggregator`, an optimizer
  * `Rule` (SketchDistinct), a DataSourceV2 connector — and now a
  * planner `SparkStrategy` with a custom `SparkPlan`.
  */
object TopKRewrite extends SparkStrategy {

  val FlagKey = "spark.graft.topk.rewrite"

  /** Upper bound on k for the rewrite (r14): the heap holds k rows PER
    * GROUP per task, so a filter like `rank <= 50_000_000` must keep
    * WindowExec's sort (which spills) rather than pin groups × k rows
    * in memory. Defaults to 1M (≈ tens of MB per group at typical row
    * widths); override per session.
    */
  val MaxKKey = "spark.graft.topk.maxK"
  val DefaultMaxK = 1000000

  private def limitOf(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, org.apache.spark.sql.types.IntegerType))
      if a.exprId == rank.exprId => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, org.apache.spark.sql.types.IntegerType))
      if a.exprId == rank.exprId => Some(v - 1)
    case EqualTo(a: Attribute, Literal(v: Int, org.apache.spark.sql.types.IntegerType))
      if a.exprId == rank.exprId && v == 1 => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case logical.Filter(cond,
        logical.Window(Seq(alias @ Alias(
          WindowExpression(RowNumber(), WindowSpecDefinition(part, order, _)), _)),
          _, _, child, _))
        if SQLConf.get.getConfString(FlagKey, "false").toBoolean && order.nonEmpty =>
      val maxK = SQLConf.get.getConfString(MaxKKey, DefaultMaxK.toString).toInt
      limitOf(cond, alias.toAttribute) match {
        case Some(k) if k > 0 && k <= maxK =>
          TopKPerGroupExec(part, order, k, alias.toAttribute, planLater(child)) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }

  /** Hook the strategy into an already-running session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(this))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ this
}

/** Per-group bounded-heap top-k: requires clustering on the partition
  * keys (Spark inserts the exchange), then one pass per partition with a
  * ≤k-row heap per group — memory O(groups × k), no per-group sort of
  * anything larger than k. Emits the child's columns plus the rank.
  */
final case class TopKPerGroupExec(partitionSpec: Seq[Expression],
                                  orderSpec: Seq[SortOrder], k: Int,
                                  rankAttr: Attribute, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionSpec.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionSpec) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val partSpec = partitionSpec
    val ordSpec = orderSpec
    val childOutput = child.output
    val kk = k
    val out = output
    child.execute().mapPartitions { iter =>
      val grouping = UnsafeProjection.create(partSpec, childOutput)
      val ordering = RowOrdering.create(ordSpec, childOutput)
      // PriorityQueue dequeues the MAX under `ordering` = the row sorting
      // LAST = the current worst of the kept k
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val heap = heaps.getOrElseUpdate(grouping(row).copy(),
          mutable.PriorityQueue.empty[InternalRow](ordering))
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      val join = new JoinedRow
      val outProj = UnsafeProjection.create(out, out)
      heaps.iterator.flatMap { case (_, heap) =>
        // dequeueAll yields max-first; reverse for rank order
        val ranked: Seq[InternalRow] = heap.dequeueAll.reverse
        ranked.iterator.zipWithIndex.map { case (r, i) =>
          outProj(join(r, new GenericInternalRow(Array[Any](i + 1)))): InternalRow
        }
      }
    }
  }
}
