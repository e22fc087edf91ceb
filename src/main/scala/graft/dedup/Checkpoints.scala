package graft.dedup

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit lifecycle for `localCheckpoint`ed frames.
  *
  * `df.localCheckpoint()` is eager: it materializes the frame into persisted
  * (MEMORY_AND_DISK) blocks and returns a frame whose plan is a flat
  * [[LogicalRDD]] over exactly that RDD. Those blocks are NOT recomputable —
  * they exist only as long as they stay persisted — so releasing them is
  * only safe once nothing can reference the frame again, and identifying
  * them must not guess: [[tracked]] reads the RDD straight out of the
  * returned frame's plan, which stays correct under concurrent jobs on the
  * same SparkContext (a getPersistentRDDs before/after diff does not).
  */
object Checkpoints {

  /** Eagerly localCheckpoint `df`; return the truncated-lineage frame plus
    * the persisted RDDs backing it (to pass to [[release]] when the frame
    * is provably dead).
    */
  def tracked(df: DataFrame): (DataFrame, Seq[RDD[_]]) = {
    val out = df.localCheckpoint()
    val rdds = out.queryExecution.logical.collect { case r: LogicalRDD => r.rdd }
    (out, rdds)
  }

  /** Drop the checkpoint blocks. Only call once the owning frame can never
    * be evaluated again — the blocks are non-recomputable.
    */
  def release(rdds: Seq[RDD[_]]): Unit = rdds.foreach(_.unpersist(false))
}
